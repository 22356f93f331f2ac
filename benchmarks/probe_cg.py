"""Flagship CG cost decomposition on the real TPU (slope method).

Measures per-iteration cost of the full CG body vs the bare operator apply,
and the LowOrderMG V-cycle cost, to locate solver-loop overhead.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import os

    order = 6
    n_1d = int(os.environ.get("L3STER_BENCH_N1D", "7"))
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, n_1d)), order=order)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    params = lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE)
    system = lt.make_algebraic_system(mesh, problem, bcs, params, dtype=jnp.float32)
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

    fn, oc = system.operator_parts()
    from l3ster_tpu.solve.precond import Jacobi
    from l3ster_tpu.solve.krylov import _col_dots

    M_fn, mc = Jacobi().setup_parts(system)
    b = jnp.ones((system.n_dofs, 1), jnp.float32)
    n_oc = len(oc)

    def cg_iters(K):
        @jax.jit
        def run(b, *cs):
            ocs, mcs = cs[:n_oc], cs[n_oc:]
            x = jnp.zeros_like(b)
            r = b
            z = M_fn(r, *mcs)
            p = z
            rz = _col_dots(r, z)

            def body(i, st):
                x, r, z, p, rz = st
                Ap = fn(p, *ocs)
                pAp = _col_dots(p, Ap)
                alpha = jnp.where(pAp != 0, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = M_fn(r, *mcs)
                rz_new = _col_dots(r, z)
                beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
                p = z + beta * p
                return (x, r, z, p, rz_new)

            st = jax.lax.fori_loop(0, K, body, (x, r, z, p, rz))
            return jnp.sum(st[0])

        float(run(b, *oc, *mc))
        t0 = time.perf_counter()
        float(run(b, *oc, *mc))
        t1 = time.perf_counter()
        float(run(b, *oc, *mc))
        return min(t1 - t0, time.perf_counter() - t1)

    r = {}
    r["cg iter ms"] = round((cg_iters(200) - cg_iters(50)) / 150 * 1e3, 4)

    # while_loop variant (as the real solver runs): same body, lax.while_loop
    def cg_while(K):
        @jax.jit
        def run(b, *cs):
            ocs, mcs = cs[:n_oc], cs[n_oc:]
            x = jnp.zeros_like(b)
            r0 = b
            z = M_fn(r0, *mcs)
            st = (x, r0, z, z, _col_dots(r0, z), jnp.asarray(0))

            def cond(st):
                return st[5] < K

            def body(st):
                x, r, z, p, rz, it = st
                Ap = fn(p, *ocs)
                pAp = _col_dots(p, Ap)
                alpha = jnp.where(pAp != 0, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = M_fn(r, *mcs)
                rz_new = _col_dots(r, z)
                beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
                return (x, r, z, z + beta * p, rz_new, it + 1)

            st = jax.lax.while_loop(cond, body, st)
            return jnp.sum(st[0])

        float(run(b, *oc, *mc))
        t0 = time.perf_counter()
        float(run(b, *oc, *mc))
        t1 = time.perf_counter()
        float(run(b, *oc, *mc))
        return min(t1 - t0, time.perf_counter() - t1)

    r["cg while-loop iter ms"] = round((cg_while(200) - cg_while(50)) / 150 * 1e3, 4)

    if "mg" in sys.argv:
        mg_fn, mgc = lt.LowOrderMG(smooth_degree=2).setup_parts(system)
        n_mg = len(mgc)

        def mg_apply(K):
            @jax.jit
            def run(b, *cs):
                def body(i, v):
                    return v + 1e-30 * mg_fn(v, *cs)

                return jnp.sum(jax.lax.fori_loop(0, K, body, b))

            float(run(b, *mgc))
            t0 = time.perf_counter()
            float(run(b, *mgc))
            t1 = time.perf_counter()
            float(run(b, *mgc))
            return min(t1 - t0, time.perf_counter() - t1)

        r["LowOrderMG vcycle ms"] = round((mg_apply(100) - mg_apply(25)) / 75 * 1e3, 4)

    print(json.dumps(r, indent=1))


if __name__ == "__main__":
    main()
