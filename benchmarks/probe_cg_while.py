"""Is the Karman CG while_loop program really ~3 ms/iteration?

probe_karman_step_parts measured the production solve at ~3.1 ms/iter
(slope between a 34-iter and a 1411-iter solve) while probe_karman_iter
measured the bare CG body chained in a fori_loop at ~0.18 ms.  This probe
times the EXACT production cg_solve program (while_loop, Jacobi, dof
layout) at forced iteration counts (tol=0), slope method, plus variants
to isolate the cost:

  real      cg_solve(tol=0, max_iters=K) as the production solver builds it
  nocond    same body in a fori_loop (no residual-based cond)
  nodots    fori_loop body without the alpha/beta dots (apply + axpys)

Run: python benchmarks/probe_cg_while.py   (TPU, ~3 min)
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
    from l3ster_tpu.solve.krylov import cg_solve, _col_dots
    from l3ster_tpu.solve.precond import Jacobi
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    DOMAIN, BOTTOM, TOP, INLET, OUTLET, CYLINDER = 0, 1, 2, 3, 4, 5
    IU, IV = 0, 1
    dt_, nu = 0.1, 1.0 / 150.0
    mesh = lt.make_cylinder_in_channel_2d(
        left_offset=6.0, right_offset=10.0, bottom_offset=4.0, top_offset=4.0,
        n_circumf=32, n_radial=8, n_left=5, n_right=16, n_bottom=5, n_top=5,
        q_radial=1.25, q_right=1.05,
    )
    mesh = lt.generate_mesh(mesh, order=3)
    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([INLET, BOTTOM, TOP, CYLINDER], [IU, IV])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
    )
    system = lt.make_algebraic_system(mesh, problem, bcs, params, dtype=jnp.float32)
    system.set_dirichlet_bc_values([0.0, 0.0], [BOTTOM, TOP, CYLINDER], [IU, IV])
    manager = lt.SolutionManager(mesh, 6)
    k_trans = navier_stokes_uvop_2d(nu, dt=dt_)
    k_outlet = navier_stokes_outlet_bc(nu)
    system.begin_assembly()
    system.assemble_problem(
        k_trans, [DOMAIN], manager.field_access([0, 1, 2, 3]),
        options=lt.AssemblyOptions(value_order=1, derivative_order=1),
    )
    system.assemble_problem(k_outlet, [OUTLET], dof_inds=(0, 1, 3))
    system.end_assembly()

    fn, oc = system.operator_parts()
    M_fn, mc = Jacobi().setup_parts(system)
    n_oc = len(oc)
    n = system.n_dofs
    b = jnp.ones((n, 1), jnp.float32)
    x0 = jnp.zeros((n, 1), jnp.float32)

    def timed_iters(make_prog, K1=100, K2=400):
        def total(K):
            prog = make_prog(K)
            jax.block_until_ready(prog(b, x0, *oc, *mc))
            t0 = time.perf_counter()
            jax.block_until_ready(prog(b, x0, *oc, *mc))
            t1 = time.perf_counter()
            jax.block_until_ready(prog(b, x0, *oc, *mc))
            return min(t1 - t0, time.perf_counter() - t1)

        return (total(K2) - total(K1)) / (K2 - K1)

    results = {}

    # the production program: cg_solve with tol=0 so it runs max_iters
    def make_real(K):
        @jax.jit
        def prog(b, x0, *cs):
            ocs, mcs = cs[:n_oc], cs[n_oc:]
            x, it, res = cg_solve(
                lambda v: fn(v, *ocs), b, x0=x0,
                precond=lambda r: M_fn(r, *mcs), tol=0.0, max_iters=K,
            )
            return x

        return prog

    results["real_while_ms"] = round(timed_iters(make_real) * 1e3, 4)
    print("real while_loop", results["real_while_ms"], flush=True)

    # same body, fori_loop (no convergence cond)
    def make_fori(K):
        @jax.jit
        def prog(b, x0, *cs):
            ocs, mcs = cs[:n_oc], cs[n_oc:]
            r0 = b - fn(x0, *ocs)
            z0 = M_fn(r0, *mcs)
            rz0 = _col_dots(r0, z0)

            def body(i, state):
                x, r, z, p, rz = state
                Ap = fn(p, *ocs)
                pAp = _col_dots(p, Ap)
                alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = M_fn(r, *mcs)
                rz_new = _col_dots(r, z)
                beta = rz_new / jnp.where(rz != 0, rz, 1.0)
                p = z + beta * p
                return (x, r, z, p, rz_new)

            state = (x0, r0, z0, z0, rz0)
            return jax.lax.fori_loop(0, K, body, state)[0]

        return prog

    results["fori_ms"] = round(timed_iters(make_fori) * 1e3, 4)
    print("fori_loop", results["fori_ms"], flush=True)

    # fori body without dots (apply + axpys with fixed scalars)
    def make_nodots(K):
        @jax.jit
        def prog(b, x0, *cs):
            ocs, mcs = cs[:n_oc], cs[n_oc:]

            def body(i, state):
                x, p = state
                Ap = fn(p, *ocs)
                z = M_fn(Ap, *mcs)
                return (x + 0.5 * z, p - 1e-6 * z)

            return jax.lax.fori_loop(0, K, body, (x0, b))[0]

        return prog

    results["nodots_ms"] = round(timed_iters(make_nodots) * 1e3, 4)
    print("nodots fori", results["nodots_ms"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
