"""Decompose the Karman matrix-free CG per-iteration cost on the real TPU.

BENCH_SWEEP records ~1.9 ms/iter for the 26k-dof transient system while the
202k-dof flagship runs 0.33 ms/iter — an 8x-smaller problem should not be
6x slower per iteration.  This probe times (slope method, chained in one
jit) the pieces:

  apply        bare constrained operator apply
  vol-only     the volume contribution alone (gather + local apply + scatter)
  gather       the volume x-row gather alone
  cg-iter      one full CG+Jacobi iteration body

Run: python benchmarks/probe_karman_iter.py   (TPU, ~3 min)
"""

from __future__ import annotations

import json
import time

import numpy as np


def timed(fn, args, K1=50, K2=200):
    import jax
    import jax.numpy as jnp

    def chain_total(K):
        @jax.jit
        def chained(x, *cs):
            def body(i, v):
                return v + 1e-30 * fn(v, *cs)

            return jnp.sum(jax.lax.fori_loop(0, K, body, x))

        float(chained(*args))
        t0 = time.perf_counter()
        float(chained(*args))
        t1 = time.perf_counter()
        float(chained(*args))
        return min(t1 - t0, time.perf_counter() - t1)

    return (chain_total(K2) - chain_total(K1)) / (K2 - K1)


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
    asm_opts = lt.AssemblyOptions(value_order=1, derivative_order=1)
    system.begin_assembly()
    system.assemble_problem(
        k_trans, [DOMAIN], manager.field_access([0, 1, 2, 3]), options=asm_opts
    )
    system.assemble_problem(k_outlet, [OUTLET], dof_inds=(0, 1, 3))
    system.end_assembly()

    n = system.n_dofs
    print(json.dumps({"n_dofs": n, "device": str(jax.devices()[0])}), flush=True)
    x = jnp.ones((n, 1), jnp.float32)
    results = {}

    # full constrained apply
    fn, oc = system.operator_parts()
    results["apply_ms"] = round(timed(lambda v, *cs: fn(v, *cs), (x, *oc)) * 1e3, 4)
    print("apply", results["apply_ms"], flush=True)

    # raw (unconstrained) apply
    fr, rc = system.raw_parts()
    results["raw_apply_ms"] = round(
        timed(lambda v, *cs: fr(v, *cs), (x, *rc)) * 1e3, 4
    )
    print("raw", results["raw_apply_ms"], flush=True)

    # per-contribution: time raw applies built from single contributions
    ops = [c for c in system._contribs if c.mode != "rhs"]
    vol = next(c for c in ops if c.boundary_id is None)
    out_c = next(c for c in ops if c.boundary_id is not None)
    for label, keep in [("vol", vol), ("outlet", out_c)]:
        kept = [keep]
        saved = system._contribs
        try:
            system._contribs = kept
            system._raw_fn_cache = None  # force structural rebuild
            f1, c1 = system.raw_parts()
            results[f"{label}_ms"] = round(
                timed(lambda v, *cs: f1(v, *cs), (x, *c1)) * 1e3, 4
            )
            print(label, results[f"{label}_ms"], flush=True)
        finally:
            system._contribs = saved
            system._raw_fn_cache = None

    # CG iteration body (apply + Jacobi + vector ops)
    from l3ster_tpu.solve.precond import Jacobi

    M_fn, mc = Jacobi().setup_parts(system)
    n_oc = len(oc)

    def cg_body(v, *cs):
        ocs, mcs = cs[:n_oc], cs[n_oc:]
        r = v - fn(v, *ocs)
        z = M_fn(r, *mcs)
        rz = jnp.sum(r * z)
        q = fn(z, *ocs)
        alpha = rz / jnp.sum(z * q)
        return v + alpha * z

    results["cg2apply_ms"] = round(
        timed(cg_body, (x, *oc, *mc)) * 1e3, 4
    )
    print("cg-body(2 applies)", results["cg2apply_ms"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
