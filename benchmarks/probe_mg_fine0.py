"""Probe: LowOrderMG fine_level0 (smooth level 0 with the fine operator)
vs the p1-on-GLL rediscretized level 0, on the flagship config (TPU).

Run: python benchmarks/probe_mg_fine0.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _diffusion_3d(inp, out):
    ops, rhs = out
    A0, Ax, Ay, Az = ops
    Ax[0, 1] = -1.0
    Ay[0, 2] = -1.0
    Az[0, 3] = -1.0
    A0[1, 1] = -1.0
    Ax[1, 0] = 1.0
    A0[2, 2] = -1.0
    Ay[2, 0] = 1.0
    A0[3, 3] = -1.0
    Az[3, 0] = 1.0
    Ay[4, 3] = 1.0
    Az[4, 2] = -1.0
    Ax[5, 3] = -1.0
    Az[5, 1] = 1.0
    Ax[6, 2] = 1.0
    Ay[6, 1] = -1.0


def _adiabatic_3d(inp, out):
    ops, _ = out
    ops[0][0, 1] = inp.normal[0]
    ops[0][0, 2] = inp.normal[1]
    ops[0][0, 3] = inp.normal[2]


def main():
    import jax
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    print("device:", jax.devices()[0])

    order, n_1d = 6, 7
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0, 1, n_1d)), order=order)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
        dtype=jnp.float32,
    )
    kd = lt.wrap_domain_equation_kernel(
        _diffusion_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    kn = lt.wrap_boundary_equation_kernel(
        _adiabatic_3d, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=3, n_equations=1)
    )
    system.set_dirichlet_bc_values(kdir, [5, 6], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [0])
    system.assemble_problem(kn, [1, 2, 3, 4])
    system.end_assembly()

    for fine0 in (False, True):
        mg = lt.CG(
            lt.IterSolverOpts(tol=1e-6, max_iters=20000),
            precond=lt.LowOrderMG(fine_level0=fine0),
        )
        t0 = time.perf_counter()
        res = system.solve(mg)
        t_cold = time.perf_counter() - t0
        best = None
        for _ in range(3):
            system.set_solution_vector(jnp.zeros_like(system.solution_vector()))
            t0 = time.perf_counter()
            res_w = system.solve(mg)
            t_w = time.perf_counter() - t0
            best = t_w if best is None else min(best, t_w)
        print(
            f"fine_level0={fine0}: cold={t_cold:.2f}s iters={res.num_iters} "
            f"warm={best:.3f}s warm_iters={res_w.num_iters} resid={res_w.tol:.2e}"
        )


if __name__ == "__main__":
    main()
