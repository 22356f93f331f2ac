"""Microbench: one VMEM-packed stage kernel vs the XLA HIGH einsum pair.

Times the x-interpolation stage of the p=6 flagship in isolation:
  XLA:    ax = einsum(t2 @ NxT, HIGH);  adx = einsum(t2 @ DxT, HIGH)
  Pallas: axd = kstacked_matmul(t2, None, [Nx|Dx] bf16x3-stacked, 2Q)
Slope timing per the axon rules.  Usage: python benchmarks/probe_xy_stage.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def slope(make_chain, K1=100, K2=400):
    def total(K):
        f = make_chain(K)
        float(f())  # warm
        t0 = time.perf_counter()
        float(f())
        t1 = time.perf_counter()
        float(f())
        return min(t1 - t0, time.perf_counter() - t1)

    return (total(K2) - total(K1)) / (K2 - K1) * 1e3  # ms


def main() -> None:
    import jax
    import jax.numpy as jnp

    from l3ster_tpu.ops.lattice_sumfact import banded_tables
    from l3ster_tpu.ops.pallas_stages import kstacked_matmul, stage_tables
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    order, q_order, ne1 = 6, 12, 6
    n1 = ne1 * order + 1  # 37
    q1 = q_order // 2 + 1
    Q = ne1 * q1  # 42
    c = 4
    M = c * n1 * n1  # czy rows
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, n1)), jnp.float32)

    Ng, Dg = banded_tables(order, q_order, ne1)
    NxT = jnp.asarray(Ng.T, jnp.float32)
    DxT = jnp.asarray(Dg.T, jnp.float32)
    TND = stage_tables(order, q_order, ne1, "ND", split=True)

    HI = jax.lax.Precision.HIGH

    def xla_pair(v):
        ax = jnp.einsum("mk,kq->mq", v, NxT, precision=HI)
        adx = jnp.einsum("mk,kq->mq", v, DxT, precision=HI)
        return ax, adx

    def pallas_one(v):
        out = kstacked_matmul(v, None, TND, 2 * Q)
        return out[:, :Q], out[:, Q:]

    def chain(fn):
        def make(K):
            @jax.jit
            def run(v):
                def body(i, v):
                    a, d = fn(v)
                    # feed back through a cheap reduction to keep shapes
                    return v * 0.999 + a[:, :n1] * 1e-6 + d[:, :n1] * 1e-6

                return jnp.sum(jax.lax.fori_loop(0, K, body, v))

            return lambda: run(x)

        return make

    t0 = time.perf_counter()
    ms_xla = slope(chain(xla_pair))
    t1 = time.perf_counter()
    ms_pal = slope(chain(pallas_one))
    t2 = time.perf_counter()
    print(
        json.dumps(
            {
                "stage": "x-interp (M=%d, K=%d, N=2x%d)" % (M, n1, Q),
                "xla_high_pair_ms": round(ms_xla, 4),
                "pallas_kstacked_ms": round(ms_pal, 4),
                "xla_walltime_s": round(t1 - t0, 1),
                "pallas_walltime_s": round(t2 - t1, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
