"""Instrument one full Karman BDF2 step with explicit device syncs.

probe_karman_step_parts showed: solve-after-reassembly 4.5 s (1411 iters),
repeat solves 0.21 s (34 iters), while the production CG program runs at
0.22 ms/iter -- so ~4 s/step is hiding somewhere OUTSIDE the while_loop.
This probe replicates the bench's step() exactly (fields update each step,
so iteration counts stay realistic) and wraps every phase in
block_until_ready so the async dispatch can't smear costs across phases.

Run: python benchmarks/probe_karman_step_sync.py   (TPU, ~5 min)
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.models.kernels import (
        navier_stokes_outlet_bc,
        navier_stokes_uvop_2d,
    )
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    DOMAIN, BOTTOM, TOP, INLET, OUTLET, CYLINDER = 0, 1, 2, 3, 4, 5
    IU, IV, IO, IP = 0, 1, 2, 3
    dt_, nu = 0.1, 1.0 / 150.0
    tol = 1e-6

    mesh = lt.make_cylinder_in_channel_2d(
        left_offset=6.0, right_offset=10.0, bottom_offset=4.0, top_offset=4.0,
        n_circumf=32, n_radial=8, n_left=5, n_right=16, n_bottom=5, n_top=5,
        q_radial=1.25, q_right=1.05,
    )
    mesh = lt.generate_mesh(mesh, order=3)
    H = mesh.node_coords[:, 1].max()

    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([INLET, BOTTOM, TOP, CYLINDER], [IU, IV])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
    )
    system = lt.make_algebraic_system(mesh, problem, bcs, params, dtype=jnp.float32)

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
    k_trans = navier_stokes_uvop_2d(nu, dt=dt_)
    k_outlet = navier_stokes_outlet_bc(nu)
    asm_opts = lt.AssemblyOptions(value_order=1, derivative_order=1)
    solver = lt.CG(
        lt.IterSolverOpts(tol=tol, max_iters=4000, chunk=1024), precond=lt.Jacobi()
    )

    def sync():
        jax.block_until_ready(system.x)
        jax.block_until_ready(manager.values)

    records = []

    def step(tag):
        nonlocal vel1, vel2
        t = {}
        t0 = time.perf_counter()
        system.begin_assembly()
        system.assemble_problem(
            k_trans, [DOMAIN], manager.field_access(vel1 + vel2), options=asm_opts
        )
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=(IU, IV, IP))
        t["asm_host"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        system.end_assembly()
        t["end_asm_host"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync()
        t["end_asm_sync"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        b = system.effective_rhs()
        jax.block_until_ready(b)
        t["eff_rhs"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = system.solve(solver)
        t["solve"] = time.perf_counter() - t0
        t["iters"] = int(res.num_iters)
        t0 = time.perf_counter()
        system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)
        sync()
        t["update"] = time.perf_counter() - t0
        vel1, vel2 = vel2, vel1
        t = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in t.items()}
        print(tag, json.dumps(t), flush=True)
        records.append(t)

    # warm start (2 steady Picard sweeps like the bench, untimed)
    k_steady = navier_stokes_uvop_2d(nu)
    for _ in range(2):
        system.begin_assembly()
        system.assemble_problem(
            k_steady, [DOMAIN], manager.field_access(vel1), options=asm_opts
        )
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=(IU, IV, IP))
        system.end_assembly()
        system.solve(solver)
        system.update_solution([IU, IV], manager, vel1)
    system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)

    step("compile")  # first transient step compiles
    for i in range(4):
        step(f"step{i}")

    print(json.dumps(records[1:]))


if __name__ == "__main__":
    main()
