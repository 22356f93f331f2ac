"""Unsteady 2D Karman vortex street -- the capstone example.

Reproduces the reference's ``examples/07-karman-2D``: incompressible
Navier-Stokes in velocity-vorticity-pressure form around a cylinder in a
channel; Picard-linearized steady solve as the initial condition, then BDF2
transient stepping with extrapolated advection velocity.  Flow-rate balance
between inlet and outlet is reported each step.

Run: python examples/karman_2d.py [n_steps] [coarse]
"""

import os
import sys

import jax

# default: CPU f64 (the oracle configuration used by the tests and the
# recorded Strouhal anchor).  KARMAN_BACKEND=native keeps whatever backend
# is live (e.g. the TPU) — the matrix-free fast path steps ~16x faster there.
if os.environ.get("KARMAN_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np

import l3ster_tpu as lt
from l3ster_tpu.models.kernels import (
    flow_rate_bc,
    navier_stokes_outlet_bc,
    navier_stokes_uvop_2d,
)

DOMAIN, BOTTOM, TOP, INLET, OUTLET, CYLINDER = 0, 1, 2, 3, 4, 5
IU, IV, IO, IP = 0, 1, 2, 3


def main(n_steps=20, coarse=True, mesh_order=2, verbose=True):
    dt = 0.1
    Re = 150.0
    nu = 1.0 * 1.0 / Re  # cylinder diameter * mean inlet velocity / Re

    if coarse:
        # note: least-squares FEM conserves mass only weakly; very coarse
        # meshes show visible inlet/outlet flow-rate imbalance (shrinks fast
        # under h/p refinement)
        mesh = lt.make_cylinder_in_channel_2d(
            left_offset=6.0, right_offset=10.0, bottom_offset=4.0, top_offset=4.0,
            n_circumf=32, n_radial=8, n_left=5, n_right=16, n_bottom=5, n_top=5,
            q_radial=1.25, q_right=1.05,
        )
        mesh_order = max(mesh_order, 3)
    else:
        mesh = lt.make_cylinder_in_channel_2d()
        mesh_order = 4
    mesh = lt.generate_mesh(mesh, order=mesh_order)
    H = mesh.node_coords[:, 1].max()

    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([INLET, BOTTOM, TOP, CYLINDER], [IU, IV])
    system = lt.make_algebraic_system(mesh, problem, bcs)
    if verbose:
        print(mesh.describe())
        print(system.describe())

    k_steady = navier_stokes_uvop_2d(nu)
    k_trans = navier_stokes_uvop_2d(nu, dt=dt)
    k_outlet = navier_stokes_outlet_bc(nu)
    k_flow = flow_rate_bc()
    asm_opts = lt.AssemblyOptions(value_order=1, derivative_order=1)

    def inlet_profile(inp, out):
        y = inp.point.y
        out[0] = 1.5 * (1.0 - (y / H) ** 2)
        out[1] = 0.0

    k_inlet = lt.wrap_boundary_residual_kernel(
        inlet_profile, lt.KernelParams(dimension=2, n_equations=2)
    )

    system.set_dirichlet_bc_values([0.0, 0.0], [BOTTOM, TOP, CYLINDER], [IU, IV])
    system.set_dirichlet_bc_values(k_inlet, [INLET], [IU, IV])

    manager = lt.SolutionManager(mesh, 6)
    vel1, vel2, vort, pres = [0, 1], [2, 3], [4], [5]
    solver = lt.Klu2()
    outlet_dofs = (IU, IV, IP)

    def flow_report(step, access):
        inflow = -float(lt.compute_integral(k_flow, mesh, [INLET], access)[0, 0])
        outflow = float(lt.compute_integral(k_flow, mesh, [OUTLET], access)[0, 0])
        if verbose:
            err = (inflow - outflow) / inflow * 100.0 if inflow else float("nan")
            print(f"{step:>6} | in {inflow:8.4f} | out {outflow:8.4f} | err {err:8.3f}%")
        return inflow, outflow

    # Picard iterations for the steady state
    for it in range(8):
        system.begin_assembly()
        system.assemble_problem(k_steady, [DOMAIN], manager.field_access(vel1), options=asm_opts)
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=outlet_dofs)
        system.end_assembly()
        system.solve(solver)
        system.update_solution([IU, IV], manager, vel1)
    system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)
    inflow, outflow = flow_report(0, manager.field_access(vel1))

    # BDF2 transient
    for step in range(1, n_steps + 1):
        system.begin_assembly()
        system.assemble_problem(
            k_trans, [DOMAIN], manager.field_access(vel1 + vel2), options=asm_opts
        )
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=outlet_dofs)
        system.end_assembly()
        system.solve(solver)
        system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)
        inflow, outflow = flow_report(step, manager.field_access(vel2))
        vel1, vel2 = vel2, vel1

    # export final snapshot
    exporter = lt.PvtuExporter(mesh)
    export = lt.ExportDefinition("/tmp/karman_final.pvtu")
    export.define_field("Velocity", vel1)
    export.define_field("Vorticity", vort)
    export.define_field("Pressure", pres)
    exporter.export_solution(export, manager)
    return inflow, outflow


def strouhal_study(
    n_steps=250,
    dt=0.15,
    mesh_order=3,
    verbose=True,
    export_every=0,
    solver=None,
    matrix_free=False,
    refine=1,
    warm_solver=None,
):
    """Vortex-shedding validation on the DFG-2D-2-like confined cylinder.

    Re = 100, channel walls at y = -2.0 / +2.1 (the slight asymmetry of the
    DFG benchmark triggers shedding without artificial forcing).  Returns
    (strouhal, imbalance_pct, v_signal): the Strouhal number from the FFT
    peak of the cross-flow velocity behind the cylinder (expected ~0.3 for
    this blockage, cf. ``examples/07-karman-2D`` and the DFG reference data),
    the final inlet/outlet flow-rate imbalance in percent, and the probe
    signal.
    """
    Re = 100.0
    nu = 1.0 / Re  # D = 1, U_mean = 1
    y_b, y_t = -2.0, 2.1

    # refine=2 doubles the mesh in each direction (~4x dofs) — the
    # configuration where PMultigrid beats Jacobi 4.3x (BENCH_SWEEP.md)
    rf = int(refine)
    mesh = lt.make_cylinder_in_channel_2d(
        r_outer=1.2,
        left_offset=2.0, right_offset=10.0, bottom_offset=-y_b, top_offset=y_t,
        n_circumf=32 * rf, n_radial=7 * rf, n_left=3 * rf, n_right=17 * rf,
        n_bottom=3 * rf, n_top=3 * rf,
        q_radial=1.28 ** (1.0 / rf), q_right=1.06 ** (1.0 / rf),
    )
    mesh = lt.generate_mesh(mesh, order=mesh_order)

    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([INLET, BOTTOM, TOP, CYLINDER], [IU, IV])
    # matrix_free: the fast transient path (batched MXU local applies, CG,
    # ~0.34 s/step settled at 26k dofs vs ~5.7 s/step for the assembled
    # direct solve) — validated to reproduce the direct-solve Strouhal
    params = (
        lt.AlgebraicSystemParams(
            eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
        )
        if matrix_free
        else lt.AlgebraicSystemParams()
    )
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    system = lt.make_algebraic_system(
        mesh, problem, bcs, params,
        dtype=jnp.float32 if (matrix_free and on_tpu) else None,
    )
    if solver is None and matrix_free:
        solver = lt.CG(
            lt.IterSolverOpts(tol=1e-6 if on_tpu else 1e-8, max_iters=6000, chunk=1024),
            precond=lt.Jacobi(),
        )
    if verbose:
        print(mesh.describe())
        print(system.describe())

    k_steady = navier_stokes_uvop_2d(nu)
    k_trans = navier_stokes_uvop_2d(nu, dt=dt)
    k_outlet = navier_stokes_outlet_bc(nu)
    k_flow = flow_rate_bc()
    asm_opts = lt.AssemblyOptions(value_order=1, derivative_order=1)

    def inlet_profile(inp, out):
        y = inp.point.y
        # parabola vanishing at both walls, mean velocity 1 over the channel
        h = y_t - y_b
        out[0] = 6.0 * (y - y_b) * (y_t - y) / h**2
        out[1] = 0.0

    k_inlet = lt.wrap_boundary_residual_kernel(
        inlet_profile, lt.KernelParams(dimension=2, n_equations=2)
    )
    system.set_dirichlet_bc_values([0.0, 0.0], [BOTTOM, TOP, CYLINDER], [IU, IV])
    system.set_dirichlet_bc_values(k_inlet, [INLET], [IU, IV])

    manager = lt.SolutionManager(mesh, 6)
    vel1, vel2, vort, pres = [0, 1], [2, 3], [4], [5]
    solver = solver or lt.Klu2()
    outlet_dofs = (IU, IV, IP)

    # probe node in the near wake (cross-flow velocity carries the shedding)
    probe_xy = np.array([2.0, 0.0])
    probe = int(np.argmin(np.linalg.norm(mesh.node_coords[:, :2] - probe_xy, axis=1)))

    # steady Picard initial condition.  A lagged PMultigrid stepping solver
    # must NOT warm-start here (a coarse factor frozen from the steady
    # operator mispreconditions the transient one — bench_karman_step notes);
    # default the Picard sweeps to Jacobi when the stepper uses PMG.
    from l3ster_tpu.solve.pmg import PMultigrid as _PMG

    picard_solver = warm_solver or (
        lt.CG(lt.IterSolverOpts(tol=1e-6, max_iters=6000, chunk=1024), precond=lt.Jacobi())
        if isinstance(getattr(solver, "precond", None), _PMG)
        else solver
    )
    for _ in range(8):
        system.begin_assembly()
        system.assemble_problem(k_steady, [DOMAIN], manager.field_access(vel1), options=asm_opts)
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=outlet_dofs)
        system.end_assembly()
        system.solve(picard_solver)
        system.update_solution([IU, IV], manager, vel1)
    system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)

    exporter = lt.PvtuExporter(mesh)
    v_sig = np.zeros(n_steps)
    # BDF2 predictor warm start for the iterative path: x0 = 2 u_n - u_{n-1}
    # (Dirichlet rows are time-constant, so the extrapolation preserves them)
    predict = jax.jit(lambda a, b: 2.0 * a - b)
    x_prev = None
    for step in range(1, n_steps + 1):
        system.begin_assembly()
        system.assemble_problem(
            k_trans, [DOMAIN], manager.field_access(vel1 + vel2), options=asm_opts
        )
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=outlet_dofs)
        system.end_assembly()
        if matrix_free:
            x_cur = system.solution_vector()
            if x_prev is not None:
                system.set_solution_vector(predict(x_cur, x_prev))
            x_prev = x_cur
        system.solve(solver)
        system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)
        vel1, vel2 = vel2, vel1
        v_sig[step - 1] = float(np.asarray(manager.values)[probe, vel1[1]])
        if verbose and step % 25 == 0:
            print(f"step {step:>4}  t={step * dt:7.2f}  v_probe={v_sig[step - 1]:+.4f}")
        if export_every and step % export_every == 0:
            ex = lt.ExportDefinition(f"/tmp/karman_strouhal_{step:05d}.pvtu")
            ex.define_field("Velocity", vel1)
            ex.define_field("Vorticity", vort)
            ex.define_field("Pressure", pres)
            exporter.export_solution(ex, manager)

    inflow = -float(lt.compute_integral(k_flow, mesh, [INLET], manager.field_access(vel1))[0, 0])
    outflow = float(lt.compute_integral(k_flow, mesh, [OUTLET], manager.field_access(vel1))[0, 0])
    imbalance = abs(inflow - outflow) / inflow * 100.0

    # Strouhal from the FFT peak over the saturated second half of the signal
    tail = v_sig[n_steps // 2 :]
    tail = tail - tail.mean()
    spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
    freqs = np.fft.rfftfreq(len(tail), d=dt)
    spec[0] = 0.0
    st = float(freqs[int(np.argmax(spec))])  # D = 1, U_mean = 1 -> St = f
    if verbose:
        print(f"Strouhal {st:.4f}  |  flow imbalance {imbalance:.3f}%  |  "
              f"peak-to-peak v {tail.min():+.3f}..{tail.max():+.3f}")
    return st, imbalance, v_sig


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "strouhal":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 250
        st, imb, _ = strouhal_study(n_steps=n, export_every=int(sys.argv[3]) if len(sys.argv) > 3 else 0)
        assert 0.25 < st < 0.35, f"Strouhal {st} outside the confined-cylinder band"
        assert imb < 1.0, f"mass imbalance {imb}%"
        print("OK")
        sys.exit(0)
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    coarse = (sys.argv[2] != "fine") if len(sys.argv) > 2 else True
    inflow, outflow = main(n_steps, coarse)
    err = abs(inflow - outflow) / inflow * 100.0
    print(f"final flow-rate imbalance: {err:.3f}%")
    assert err < 5.0, "flow rate not conserved"
    print("OK")
