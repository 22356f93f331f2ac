"""Flagship time-to-solve probe: CG+Jacobi vs CG+LowOrderMG on the real TPU.

Reports iterations and warm-solve seconds for each preconditioner on the
bench.py workload (3D diffusion p=6, 4 unknowns, Neumann faces + Dirichlet).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _adiabatic_3d, _diffusion_3d

    order = 6
    n_1d = int(os.environ.get("L3STER_BENCH_N1D", "7"))
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, n_1d)), order=order)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    params = lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE)
    system = lt.make_algebraic_system(mesh, problem, bcs, params, dtype=jnp.float32)

    kd = lt.wrap_domain_equation_kernel(
        lambda i, o: _diffusion_3d(i, o), lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    kn = lt.wrap_boundary_equation_kernel(
        lambda i, o: _adiabatic_3d(i, o), lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=3, n_equations=1)
    )
    system.set_dirichlet_bc_values(kdir, [5, 6], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [0])
    system.assemble_problem(kn, [1, 2, 3, 4])
    system.end_assembly()

    r = {}
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    for name in ("jacobi", "mg"):
        if which not in (name, "both"):
            continue
        if name == "jacobi":
            pre = lt.Jacobi()
        else:
            pre = lt.LowOrderMG(
                smooth_degree=int(os.environ.get("MG_DEG", "2")),
                cycles=int(os.environ.get("MG_CYCLES", "1")),
                n_levels=int(os.environ.get("MG_LEVELS", "3")),
            )
        solver = lt.CG(lt.IterSolverOpts(tol=1e-6, max_iters=20000), precond=pre)
        t0 = time.perf_counter()
        res = system.solve(solver)
        cold = time.perf_counter() - t0
        system.set_solution_vector(jnp.zeros_like(system.solution_vector()))
        t0 = time.perf_counter()
        res = system.solve(solver)
        warm = time.perf_counter() - t0
        r[name] = dict(
            iters=int(res.num_iters), cold_s=round(cold, 2), warm_s=round(warm, 3),
        )
    print(json.dumps(r))


if __name__ == "__main__":
    main()
