"""Micro-probe: alternative y-stage formulations of the lattice-SF apply.

The flagship volume sweep spends its XLA time in six y-axis einsums
(three forward ``czyQ,yR->czRQ``, three transpose) whose batched-matmul
shape is tiny per batch element: batch c*n1z = 148, M = R = 42, K = 37,
N = 42 — heavily padded on every MXU tile.  This probe times, with dummy
flagship-shaped data on the real TPU (slope method), the candidate
re-formulations:

  A  current       three einsums czyQ,yR->czRQ (batch=cz, M=R, K=y, N=Q)
  B  N-packed      [Ny|Dy] concat: 2 einsums, one at N=2R
  C  Q-major dot   relayout czyQ->czQy, then (czQ,y)@(y,R): ONE merged-M
                   matmul per tensor (M = c*z*Q = 6216, K=37, N=42)
  D  x-emits-Qy    x-stage writes czQy directly (transpose fused into the
                   x-stage epilogue), then C's merged-M y dots

Run: python benchmarks/probe_ystage.py   (needs the TPU; ~2 min)
"""

from __future__ import annotations

import json
import time

import numpy as np


def timed(fn, args, K1=50, K2=250):
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

    from l3ster_tpu.ops.lattice_sumfact import _PREC, banded_tables
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    order, q_order, ne1 = 6, 12, 6
    c = 4
    Ng, Dg = banded_tables(order, q_order, ne1)  # (Q, n1)
    n1 = Ng.shape[1]
    Q = Ng.shape[0]
    NxT = jnp.asarray(Ng.T, jnp.float32)
    DxT = jnp.asarray(Dg.T, jnp.float32)
    NyT, DyT = NxT, DxT
    NDyT = jnp.concatenate([NyT, DyT], axis=1)  # (n1, 2Q)

    t = jnp.asarray(np.random.rand(c, n1, n1, n1), jnp.float32)

    results = {}

    def xstage(v):
        ax = jnp.einsum("czyx,xQ->czyQ", v, NxT, precision=_PREC)
        adx = jnp.einsum("czyx,xQ->czyQ", v, DxT, precision=_PREC)
        return ax, adx

    def back(v3, shape):
        # reduce whatever the variant made back to the carry's shape
        return sum(jnp.sum(z) for z in v3) * jnp.ones(shape, jnp.float32)

    # A: current
    def varA(v):
        ax, adx = xstage(v)
        b = jnp.einsum("czyQ,yR->czRQ", ax, NyT, precision=_PREC)
        bdy = jnp.einsum("czyQ,yR->czRQ", ax, DyT, precision=_PREC)
        bdx = jnp.einsum("czyQ,yR->czRQ", adx, NyT, precision=_PREC)
        return back((b, bdy, bdx), v.shape)

    # B: N-packed [N|D] on the shared-input pair
    def varB(v):
        ax, adx = xstage(v)
        bb = jnp.einsum("czyQ,yR->czRQ", ax, NDyT, precision=_PREC)  # (c,z,2R,Q)
        bdx = jnp.einsum("czyQ,yR->czRQ", adx, NyT, precision=_PREC)
        return back((bb, bdx), v.shape)

    # C: explicit relayout to Q-major then merged-M dots
    def varC(v):
        ax, adx = xstage(v)
        axq = jnp.swapaxes(ax, 2, 3)  # czQy
        adxq = jnp.swapaxes(adx, 2, 3)
        b = jnp.einsum("czQy,yR->czQR", axq, NyT, precision=_PREC)
        bdy = jnp.einsum("czQy,yR->czQR", axq, DyT, precision=_PREC)
        bdx = jnp.einsum("czQy,yR->czQR", adxq, NyT, precision=_PREC)
        return back((b, bdy, bdx), v.shape)

    # D: x-stage emits czQy directly
    def varD(v):
        ax = jnp.einsum("czyx,xQ->czQy", v, NxT, precision=_PREC)
        adx = jnp.einsum("czyx,xQ->czQy", v, DxT, precision=_PREC)
        b = jnp.einsum("czQy,yR->czQR", ax, NyT, precision=_PREC)
        bdy = jnp.einsum("czQy,yR->czQR", ax, DyT, precision=_PREC)
        bdx = jnp.einsum("czQy,yR->czQR", adx, NyT, precision=_PREC)
        return back((b, bdy, bdx), v.shape)

    # E: x-stage only (baseline to subtract)
    def varE(v):
        ax, adx = xstage(v)
        return back((ax, adx), v.shape)

    # F/G: y-TRANSPOSE side (a2 = a@Ny + ady@Dy): two einsums + add vs one
    # K-stacked einsum with the [Ny|Dy] table (K = 2R)
    NDyK = jnp.concatenate([NyT, DyT], axis=1)  # (y, 2R) used as (y, K)
    a = jnp.asarray(np.random.rand(c, n1, Q, Q), jnp.float32)
    ady = jnp.asarray(np.random.rand(c, n1, Q, Q), jnp.float32)

    def varF(v):
        a2 = jnp.einsum("czRQ,yR->czyQ", a + 1e-30 * v[..., :1, :1], NyT,
                        precision=_PREC) + jnp.einsum(
            "czRQ,yR->czyQ", ady + 1e-30 * v[..., :1, :1], DyT, precision=_PREC)
        return jnp.sum(a2) * jnp.ones(v.shape, jnp.float32)

    def varG(v):
        stk = jnp.concatenate([a + 1e-30 * v[..., :1, :1], ady], axis=2)  # (c,z,2R,Q)
        a2 = jnp.einsum("czKQ,yK->czyQ", stk, NDyK, precision=_PREC)
        return jnp.sum(a2) * jnp.ones(v.shape, jnp.float32)

    for name, fn in [("E x-only", varE), ("A current", varA), ("B N-packed", varB),
                     ("C relayout+merged-M", varC), ("D x-emits-Qy", varD),
                     ("F ytrans 2einsum", varF), ("G ytrans K-stacked", varG)]:
        dt = timed(fn, (t,))
        results[name] = round(dt * 1e6, 1)
        print(name, results[name], "us", flush=True)

    print(json.dumps({"unit": "us/apply(x+y fwd stages)", **results}))


if __name__ == "__main__":
    main()
