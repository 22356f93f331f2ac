"""Stage-by-stage timing of the flagship LATTICE_SF apply on the real TPU.

Times cumulative prefixes of the lattice pipeline (each chained K times in
one jit with a host scalar readback, per the axon timing rules) so the cost
of each stage is the difference between consecutive prefixes:

  P1 entry transpose + x-stage einsums (ax, adx)
  P2 + y-stage einsums (b, bdy, bdx)
  P3 + fused Pallas z-sweep
  P4 + y-transpose einsums
  P5 + x-transpose + exit transpose  (= full volume apply)
  FACES the four boundary-side contributions + scatter
  FULL  the constrained operator (volume + faces + masking)
"""

from __future__ import annotations

import json
import time

import numpy as np


def timed(fn, x, consts, K1=50, K2=250):
    """Per-apply seconds by the SLOPE between two chain lengths (the scalar
    readback through the axon tunnel costs ~29ms FIXED; total/K would smear
    it as ~0.29ms of phantom per-apply time at K=100)."""
    import jax
    import jax.numpy as jnp

    def chain_total(K):
        @jax.jit
        def chained(x, *cs):
            def body(i, v):
                out = fn(v, *cs)
                return v + 1e-30 * out

            return jnp.sum(jax.lax.fori_loop(0, K, body, x))

        float(chained(x, *consts))
        t0 = time.perf_counter()
        float(chained(x, *consts))
        t1 = time.perf_counter()
        float(chained(x, *consts))
        return min(t1 - t0, time.perf_counter() - t1)

    return (chain_total(K2) - chain_total(K1)) / (K2 - K1)


def main() -> None:
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

    # ---- pull the lattice contribution's pieces
    cvol = next(c for c in system._contribs if c.tables.side is None)
    op_data = system._operator_data(cvol)
    kind, A_const = op_data[0], op_data[1]
    assert kind in ("lattice_sf_const", "lattice_sf_const_diag"), kind
    if kind == "lattice_sf_const":
        _, _, Ji_l, w_l = op_data
        geom_parts = None
    else:
        geom_parts = tuple(op_data[2:])
        Ji_l = w_l = None
    plan = system._lattice_plan(cvol)
    n1, ne = plan[0], plan[1]
    q_order = cvol.options.quadrature_order(order)
    q1 = q_order // 2 + 1
    n_unk = 4
    n_rows = system.n_dofs // n_unk

    from l3ster_tpu.ops.lattice_sumfact import _PREC, _tabs, banded_tables
    from l3ster_tpu.ops.pallas_zsweep2 import fused_z_sweep_v2

    dim = 3
    c = n_unk
    A = np.asarray(A_const)

    def volume_prefix(depth):
        def fn(t, *gconsts):
            # mirrors local_apply_lattice's fused_z branch EXACTLY: lattice
            # (tensor_io) input, cz-layout kernel handoff, natural einsums
            tabs = _tabs(order, q_order, ne, t.dtype)
            (NxT, DxT), (NyT, DyT), (NzT, DzT) = tabs
            ax = jnp.einsum("czyx,xQ->czyQ", t, NxT, precision=_PREC)
            adx0 = jnp.einsum("czyx,xQ->czyQ", t, DxT, precision=_PREC)
            if depth == 1:
                return jnp.sum(ax) + jnp.sum(adx0)
            S, R, Q = tuple(q1 * n for n in reversed(ne))
            n1z = t.shape[1]
            b = jnp.einsum("czyQ,yR->czRQ", ax, NyT, precision=_PREC).reshape(c, n1z, R * Q)
            bdy = jnp.einsum("czyQ,yR->czRQ", ax, DyT, precision=_PREC).reshape(c, n1z, R * Q)
            bdx = jnp.einsum("czyQ,yR->czRQ", adx0, NyT, precision=_PREC).reshape(c, n1z, R * Q)
            if depth == 2:
                return jnp.sum(b) + jnp.sum(bdy) + jnp.sum(bdx)
            if geom_parts is not None:
                geom_t = ("diag",) + gconsts
            else:
                geom_t = ("full", gconsts[0].reshape(dim * dim, S, R * Q), gconsts[1].reshape(S, R * Q))
            Ngz, Dgz = banded_tables(order, q_order, ne[2])
            a, ady, adx = fused_z_sweep_v2(
                A, b, bdy, bdx, geom_t, NzT, DzT, host_tables=(Ngz.T, Dgz.T),
                layout="cz",
            )
            if depth == 3:
                return jnp.sum(a) + jnp.sum(ady) + jnp.sum(adx)
            a = a.reshape(c, n1z, R, Q)
            ady = ady.reshape(c, n1z, R, Q)
            adx = adx.reshape(c, n1z, R, Q)
            a2 = jnp.einsum("czRQ,yR->czyQ", a, NyT, precision=_PREC) + jnp.einsum(
                "czRQ,yR->czyQ", ady, DyT, precision=_PREC
            )
            adx2 = jnp.einsum("czRQ,yR->czyQ", adx, NyT, precision=_PREC)
            if depth == 4:
                return jnp.sum(a2) + jnp.sum(adx2)
            y = jnp.einsum("czyQ,xQ->czyx", a2, NxT, precision=_PREC) + jnp.einsum(
                "czyQ,xQ->czyx", adx2, DxT, precision=_PREC
            )
            return jnp.sum(y)

        return fn

    x = jnp.ones((c,) + tuple(reversed(n1)), jnp.float32)
    gconsts = geom_parts if geom_parts is not None else (Ji_l, w_l)
    results = {}
    prev = 0.0
    names = ["x-stage", "y-stage", "pallas-z", "y-transpose", "x-transpose"]
    for depth in range(1, 6):
        dt = timed(volume_prefix(depth), x, gconsts)
        results[f"P{depth} {names[depth-1]}"] = dict(
            cum_ms=round(dt * 1e3, 4), stage_ms=round((dt - prev) * 1e3, 4)
        )
        prev = dt

    # faces-only: full apply minus the volume lattice contribution
    fn_all, consts_all = system.raw_parts()

    def faces_only(x2d, *cs):
        return fn_all(x2d, *cs)

    x2 = jnp.ones((system.n_dofs, 1), jnp.float32)
    dt_all_raw = timed(lambda v, *cs: jnp.sum(fn_all(v, *cs)) * jnp.ones_like(v), x2, consts_all)
    results["raw apply (vol+faces)"] = dict(cum_ms=round(dt_all_raw * 1e3, 4))

    fnc, constsc = system.operator_parts()
    dt_full = timed(lambda v, *cs: fnc(v, *cs), x2, constsc)
    results["constrained apply (dof layout)"] = dict(cum_ms=round(dt_full * 1e3, 4))

    fnl, constsl = system.operator_parts(layout="lattice")
    xl = system.to_lattice_layout(x2)
    dt_lat = timed(lambda v, *cs: fnl(v, *cs), xl, constsl)
    results["constrained apply (lattice layout)"] = dict(cum_ms=round(dt_lat * 1e3, 4))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
