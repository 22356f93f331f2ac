"""Quantify the fixed per-call cost of the readback timing harness, and
re-measure the flagship apply at several chain lengths K to separate
F (fixed) from c (per-apply) via total = F + K*c."""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    r = {}

    # raw readback cost: scalar sum of a tiny resident array
    x0 = jnp.ones((128,), jnp.float32)
    f0 = jax.jit(lambda v: jnp.sum(v))
    float(f0(x0))
    t0 = time.perf_counter()
    for _ in range(20):
        float(f0(x0))
    r["tiny sum readback ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)

    big = jnp.ones((202612,), jnp.float32)
    fb = jax.jit(lambda v: jnp.sum(v))
    float(fb(big))
    t0 = time.perf_counter()
    for _ in range(20):
        float(fb(big))
    r["big sum readback ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)

    # flagship apply at K = 25, 100, 400
    import os

    order = 6
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, 7)), order=order)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    params = lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE)
    system = lt.make_algebraic_system(mesh, problem, bcs, params, dtype=jnp.float32)
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _adiabatic_3d, _diffusion_3d

    kd = lt.wrap_domain_equation_kernel(
        lambda i, o: _diffusion_3d(i, o), lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    kn = lt.wrap_boundary_equation_kernel(
        lambda i, o: _adiabatic_3d(i, o), lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    system.begin_assembly()
    system.assemble_problem(kd, [0])
    system.assemble_problem(kn, [1, 2, 3, 4])
    system.end_assembly()
    fn, consts = system.operator_parts()
    x = jnp.ones((system.n_dofs, 1), jnp.float32)

    for K in (25, 100, 400):

        @jax.jit
        def chained(x, *cs):
            def body(i, v):
                v = fn(v, *cs)
                return v * (1.0 / jnp.maximum(jnp.sqrt(jnp.sum(v * v)), 1e-30))

            return jnp.sum(jax.lax.fori_loop(0, K, body, x))

        float(chained(x, *consts))
        t0 = time.perf_counter()
        float(chained(x, *consts))
        t1 = time.perf_counter()
        float(chained(x, *consts))
        t2 = time.perf_counter()
        r[f"apply chain K={K} total ms"] = round(min(t1 - t0, t2 - t1) * 1e3, 3)

    # fit F + K*c on the two largest K
    a, b = r["apply chain K=100 total ms"], r["apply chain K=400 total ms"]
    c = (b - a) / 300.0
    r["per-apply ms (fit)"] = round(c, 4)
    r["fixed ms (fit)"] = round(a - 100 * c, 3)
    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
