"""Per-step cost of BDF2 Karman transient stepping: direct vs lagged-ILU0 CG.

The recorded TPU transient-stepping number (BENCH_SWEEP.md) is 14.6 s/step,
dominated by the per-step Klu2 direct solve (host SuperLU on a CSR gathered
through the tunnel).  The framework's answer is iterative stepping with a
lagged preconditioner: the LSFEM normal equations are SPD even for
Navier-Stokes, so CG applies, and ``ILU0(lag=k)`` freezes the factors for k
reassemblies (``solve/Ifpack2Preconditioners.hpp:85-96`` initialize/compute
semantics) so the host factorization cost amortizes while the per-step solve
runs fully on device.

Prints one JSON line per configuration:
  {"metric": "karman BDF2 step (solver)", "value": s/step, ...}

Run on the TPU (default) or CPU:  python benchmarks/bench_karman_step.py
Env: KARMAN_STEPS (default 6), KARMAN_LAG (default 4).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("KARMAN_CPU"):  # smoke-test mode (axon ignores JAX_PLATFORMS)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.models.kernels import (
        flow_rate_bc,
        navier_stokes_outlet_bc,
        navier_stokes_uvop_2d,
    )
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    n_steps = int(os.environ.get("KARMAN_STEPS", "6"))
    # Steps timed AFTER the compile step: the first 2-3 transient steps out of
    # the Picard steady warm start take 1.5-2.7x the settled iteration count
    # (measured 08-20: iters [1287, 2092, 773, 780, ...]), so the settled
    # per-step rate needs a few untimed settling steps first.
    n_warm = int(os.environ.get("KARMAN_WARM", "3"))
    lag_env = os.environ.get("KARMAN_LAG", "4")
    lag = lag_env if lag_env == "auto" else int(lag_env)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    # f32 CG stagnates near 1e-7 relative residual; 1e-6 per step is far
    # below the BDF2 local truncation error at dt=0.1
    tol = 1e-6 if on_tpu else 1e-8

    DOMAIN, BOTTOM, TOP, INLET, OUTLET, CYLINDER = 0, 1, 2, 3, 4, 5
    IU, IV, IO, IP = 0, 1, 2, 3
    dt = 0.1
    nu = 1.0 / 150.0

    # KARMAN_REFINE=2 doubles the mesh in each direction (~4x dofs): the
    # preconditioner-scaling configuration (Jacobi iteration counts grow with
    # 1/h; PMG stays ~flat)
    rf = int(os.environ.get("KARMAN_REFINE", "1"))
    mesh = lt.make_cylinder_in_channel_2d(
        left_offset=6.0, right_offset=10.0, bottom_offset=4.0, top_offset=4.0,
        n_circumf=32 * rf, n_radial=8 * rf, n_left=5 * rf, n_right=16 * rf,
        n_bottom=5 * rf, n_top=5 * rf,
        q_radial=1.25 ** (1.0 / rf), q_right=1.05 ** (1.0 / rf),
    )
    mesh = lt.generate_mesh(mesh, order=3)
    H = mesh.node_coords[:, 1].max()

    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([INLET, BOTTOM, TOP, CYLINDER], [IU, IV])

    k_steady = navier_stokes_uvop_2d(nu)
    k_trans = navier_stokes_uvop_2d(nu, dt=dt)
    k_outlet = navier_stokes_outlet_bc(nu)
    asm_opts = lt.AssemblyOptions(value_order=1, derivative_order=1)
    outlet_dofs = (IU, IV, IP)

    def inlet_profile(inp, out):
        y = inp.point.y
        out[0] = 1.5 * (1.0 - (y / H) ** 2)
        out[1] = 0.0

    k_inlet = lt.wrap_boundary_residual_kernel(
        inlet_profile, lt.KernelParams(dimension=2, n_equations=2)
    )

    def run(solver_name: str, matrix_free: bool = False, condense: bool = False):
        params = lt.AlgebraicSystemParams(
            eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
            if matrix_free
            else lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY,
            cond_policy=lt.CondensationPolicy.ELEMENT_BOUNDARY
            if condense
            else lt.CondensationPolicy.NONE,
        )
        system = lt.make_algebraic_system(mesh, problem, bcs, params, dtype=dtype)
        system.set_dirichlet_bc_values([0.0, 0.0], [BOTTOM, TOP, CYLINDER], [IU, IV])
        system.set_dirichlet_bc_values(k_inlet, [INLET], [IU, IV])
        manager = lt.SolutionManager(mesh, 6)
        vel1, vel2, vort, pres = [0, 1], [2, 3], [4], [5]

        # chunk: the axon tunnel kills single device programs at ~60 s; the
        # assembled CSR paths cost 41 ms/iter (gather-bound SpMV) and ILU0's
        # 2236-level tri-solve 533 ms/iter (measured 2026-08-19), so chunked
        # outer restarts are required for tunnel safety
        if solver_name.startswith("klu2"):
            solver = lt.Klu2()
        elif solver_name.startswith("cg+ilu0"):
            solver = lt.CG(
                lt.IterSolverOpts(tol=tol, max_iters=300, chunk=64),
                precond=lt.ILU0(lag=lag),
            )
        elif "pmg" in solver_name:
            # unstructured p->1 multigrid: ~6 fine applies + one coarse MXU
            # matmul per iteration (~21 ms) -> chunk=256 keeps one device
            # program ~5 s, well under the tunnel's ~60 s kill
            solver = lt.CG(
                lt.IterSolverOpts(tol=tol, max_iters=2000, chunk=256),
                precond=lt.PMultigrid(lag=lag),
            )
        else:
            solver = lt.CG(
                lt.IterSolverOpts(tol=tol, max_iters=4000, chunk=1024),
                precond=lt.Jacobi(),
            )

        # steady Picard warm start (2 sweeps suffice for a timing run).
        # The lagged PMG must NOT be used here: its frozen coarse factor
        # would carry the STEADY operator (no dt mass term) into the first
        # transient solves and misprecondition them (measured: 2048-iter cap
        # vs 113 after refresh, 2026-08-19) — warm up with Jacobi so the
        # first PMG setup sees the transient operator.
        warm_solver = (
            lt.CG(lt.IterSolverOpts(tol=tol, max_iters=4000, chunk=1024), precond=lt.Jacobi())
            if "pmg" in solver_name
            else solver
        )
        for _ in range(2):
            system.begin_assembly()
            system.assemble_problem(
                k_steady, [DOMAIN], manager.field_access(vel1), options=asm_opts
            )
            system.assemble_problem(k_outlet, [OUTLET], dof_inds=outlet_dofs)
            system.end_assembly()
            system.solve(warm_solver)
            system.update_solution([IU, IV], manager, vel1)
        system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)

        # BDF2 predictor warm start (VERDICT r4 item 5): seed the solve with
        # the linear extrapolation x0 = 2 u_n - u_{n-1} instead of u_n.
        # Dirichlet rows are time-constant, so 2x - x leaves them unchanged.
        # KARMAN_EXTRAP=0 disables it for A/B iteration-count studies.
        extrapolate = os.environ.get("KARMAN_EXTRAP", "1") != "0"
        predict = jax.jit(lambda a, b: 2.0 * a - b)
        x_prev = None

        def step():
            nonlocal vel1, vel2, x_prev
            system.begin_assembly()
            system.assemble_problem(
                k_trans, [DOMAIN], manager.field_access(vel1 + vel2), options=asm_opts
            )
            system.assemble_problem(k_outlet, [OUTLET], dof_inds=outlet_dofs)
            system.end_assembly()
            if extrapolate:
                x_cur = system.solution_vector()
                if x_prev is not None:
                    system.set_solution_vector(predict(x_cur, x_prev))
                x_prev = x_cur
            res = system.solve(solver)
            system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)
            vel1, vel2 = vel2, vel1
            return res

        step()  # first transient step compiles the transient-kernel programs
        for _ in range(n_warm):  # settle into the periodic iteration regime
            step()
        from l3ster_tpu.utils.profiling import profile_enabled, profile_reset

        if profile_enabled():  # settled-regime phase attribution only
            profile_reset()
        t0 = time.perf_counter()
        iters, cap_hits = [], 0
        for _ in range(n_steps):
            r = step()
            iters.append(getattr(r, "num_iters", 0))
            cap_hits += bool(getattr(r, "capped", False))
        per_step = (time.perf_counter() - t0) / n_steps
        print(
            json.dumps(
                {
                    "metric": f"karman BDF2 step ({solver_name})",
                    "value": round(per_step, 3),
                    "unit": "s/step",
                    "n_dofs": system.n_dofs,
                    "steps": n_steps,
                    "iters": iters,
                    # steps that stopped at max_iters WITHOUT converging —
                    # must be 0 for a valid transient record
                    "cap_hits": cap_hits,
                    "extrapolated_x0": extrapolate,
                    "device": str(jax.devices()[0]),
                }
            )
        )
        return per_step

    which = os.environ.get("KARMAN_SOLVER", "klu2,mf-cg")
    for w in which.split(","):
        if w == "klu2":
            run("klu2")
        elif w == "cg":
            # assembled CSR CG: gather-bound SpMV (~41 ms/iter at this size)
            # AND ILU0's 2236-level tri-solve is sequential-latency hostile —
            # kept for reference, bounded so the program stays tunnel-safe
            run(f"cg+ilu0(lag={lag})")
        elif w == "mf-cg":
            # matrix-free stepping: batched MXU local apply, no CSR gathers
            run("mf cg+jacobi", matrix_free=True)
        elif w == "mf-cg-pmg":
            # matrix-free stepping + unstructured p-multigrid (solve/pmg.py):
            # the strong-preconditioner path the assembled ILU0 cannot give
            # on TPU (level-scheduled tri-solves are sequential-latency bound)
            run(f"mf cg+pmg(lag={lag})", matrix_free=True)
        elif w == "klu2-cond":
            # the reference's headline config: assembled + ElementBoundary
            # static condensation (interior dofs Schur-eliminated per
            # element before the host factorization)
            run("klu2+condensation", condense=True)


if __name__ == "__main__":
    main()
