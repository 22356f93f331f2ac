"""Decompose the Karman BDF2 step's 2.17 s into its host-visible parts.

probe_karman_iter measured the bare CG body at ~0.36 ms / 2 applies, so
~1150 iters should cost ~0.4 s -- yet bench_karman_step records 2.17 s/step.
This probe reproduces the bench's mf-cg configuration and times each part
of a warm step separately:

  begin/assemble/end    reassembly (structurally cached)
  solve                 the CG+Jacobi solve (and its reported iters)
  update_solution       solution scatter into the SolutionManager

Run: python benchmarks/probe_karman_step_parts.py   (TPU, ~4 min)
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

    def assemble():
        system.begin_assembly()
        system.assemble_problem(
            k_trans, [DOMAIN], manager.field_access(vel1 + vel2), options=asm_opts
        )
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=(IU, IV, IP))
        system.end_assembly()

    # two warm steps (compile everything)
    for _ in range(2):
        assemble()
        res = system.solve(solver)
        system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)
        vel1, vel2 = vel2, vel1

    out = {"n_dofs": system.n_dofs}

    # timed parts, 3 repetitions each
    for name, fnc in [
        ("assemble_s", assemble),
        ("solve_s", lambda: system.solve(solver)),
        (
            "update_solution_s",
            lambda: system.update_solution(
                [IU, IV, IO, IP], manager, vel2 + vort + pres
            ),
        ),
    ]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fnc()
            ts.append(time.perf_counter() - t0)
            if name == "solve_s" and hasattr(r, "num_iters"):
                out.setdefault("iters", []).append(int(r.num_iters))
        out[name] = [round(t, 4) for t in ts]
        print(name, out[name], flush=True)

    # solve with a bigger chunk (fewer host restarts)
    big = lt.CG(
        lt.IterSolverOpts(tol=tol, max_iters=4000, chunk=4000), precond=lt.Jacobi()
    )
    r = system.solve(big)  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = big and system.solve(big)
        ts.append(time.perf_counter() - t0)
    out["solve_chunk4000_s"] = [round(t, 4) for t in ts]
    out["iters_chunk4000"] = int(r.num_iters)
    print("solve_chunk4000", out["solve_chunk4000_s"], out["iters_chunk4000"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
