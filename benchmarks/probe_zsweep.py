"""Standalone timing of the fused z-sweep kernel at flagship shapes.

Slope method (two chain lengths) per the axon timing rules.  Usage:
  python benchmarks/probe_zsweep.py [variant ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def time_fn(make_chain, K1=50, K2=200):
    def total(K):
        f = make_chain(K)
        t0 = time.perf_counter()
        float(f())
        t1 = time.perf_counter()
        float(f())
        return min(t1 - t0, time.perf_counter() - t1)

    make_chain(K1)()  # warm compile K1
    make_chain(K2)()  # warm compile K2
    return (total(K2) - total(K1)) / (K2 - K1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    # flagship shapes: p=6, ne=6, q1=7, c=4, n_eq=7
    p, ne, q1, c, n_eq = 6, 6, 7, 4, 7
    n1z = ne * p + 1
    S = R = Q = ne * q1
    RQ = R * Q
    rng = np.random.default_rng(0)
    dt = jnp.float32
    b = jnp.asarray(rng.normal(size=(n1z, c, RQ)), dt)
    bdy = jnp.asarray(rng.normal(size=(n1z, c, RQ)), dt)
    bdx = jnp.asarray(rng.normal(size=(n1z, c, RQ)), dt)
    ji = jnp.asarray(
        (rng.normal(size=(3, 3, S, RQ)) * 0.1 + np.eye(3)[:, :, None, None]).reshape(
            9, S, RQ
        ),
        dt,
    )
    w = jnp.asarray(rng.uniform(0.5, 1.0, (S, RQ)), dt)
    from l3ster_tpu.ops.sumfact import sumfact_tables_1d
    from l3ster_tpu.ops.lattice_sumfact import banded_tables

    Ng, Dg = banded_tables(p, 2 * p, ne)
    NzT = jnp.asarray(Ng.T, dt)
    DzT = jnp.asarray(Dg.T, dt)
    A = (rng.normal(size=(4, n_eq, c)) * (rng.uniform(size=(4, n_eq, c)) > 0.6)).astype(
        np.float64
    )

    results = {}
    variants = sys.argv[1:] or ["v1"]

    if "v1" in variants:
        from l3ster_tpu.ops.pallas_zsweep import fused_z_sweep

        def mk(K):
            @jax.jit
            def f(b, bdy, bdx, ji, w):
                def body(i, carry):
                    bb, s = carry
                    a, ady, adx = fused_z_sweep(A, bb, bdy, bdx, ji, w, NzT, DzT)
                    return bb * (1.0 + 1e-30 * a[0, 0, 0]), s + a[0, 0, 0]

                return jax.lax.fori_loop(0, K, body, (b, jnp.zeros((), dt)))[1]

            return lambda: f(b, bdy, bdx, ji, w)

        results["v1 current"] = round(time_fn(mk), 4)

    if "v2" in variants:
        from l3ster_tpu.ops.pallas_zsweep2 import fused_z_sweep_v2

        def mk2(K):
            @jax.jit
            def f(b, bdy, bdx, ji, w):
                def body(i, carry):
                    bb, s = carry
                    a, ady, adx = fused_z_sweep_v2(A, bb, bdy, bdx, ("full", ji, w), NzT, DzT)
                    return bb * (1.0 + 1e-30 * a[0, 0, 0]), s + a[0, 0, 0]

                return jax.lax.fori_loop(0, K, body, (b, jnp.zeros((), dt)))[1]

            return lambda: f(b, bdy, bdx, ji, w)

        results["v2 full-ji"] = round(time_fn(mk2), 4)

    if "v2d" in variants:
        from l3ster_tpu.ops.pallas_zsweep2 import fused_z_sweep_v2

        jx = jnp.asarray(rng.uniform(0.5, 1.5, (1, RQ)), dt)
        jy = jnp.asarray(rng.uniform(0.5, 1.5, (1, RQ)), dt)
        jz = jnp.asarray(rng.uniform(0.5, 1.5, (S, 1)), dt)
        wyx = jnp.asarray(rng.uniform(0.5, 1.0, (1, RQ)), dt)
        wz = jnp.asarray(rng.uniform(0.5, 1.0, (S, 1)), dt)

        def mk3(K):
            @jax.jit
            def f(b, bdy, bdx, jx, jy, jz, wyx, wz):
                def body(i, carry):
                    bb, s = carry
                    a, ady, adx = fused_z_sweep_v2(
                        A, bb, bdy, bdx, ("diag", jx, jy, jz, wyx, wz), NzT, DzT
                    )
                    return bb * (1.0 + 1e-30 * a[0, 0, 0]), s + a[0, 0, 0]

                return jax.lax.fori_loop(0, K, body, (b, jnp.zeros((), dt)))[1]

            return lambda: f(b, bdy, bdx, jx, jy, jz, wyx, wz)

        results["v2 diag-ji"] = round(time_fn(mk3), 4)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
