"""Pallas TPU kernel: fused sum-factorized local operator apply.

Fuses the nodes->QP sweeps, the constant-coefficient per-QP least-squares
algebra, and the QP->nodes transpose sweeps into ONE kernel whose
intermediates never leave VMEM (the XLA path round-trips every sweep stage
through HBM).  Constant-coefficient kernels only; grid over element batches.

Mosaic-friendly design rules used here:
- the element-batch axis lives in LANES (last dim) and is never contracted;
- every reshape touches only leading dims (tile layout never changes);
- the small 1D contractions (n <-> q1 per spatial axis) are fully unrolled
  into scalar-coefficient FMAs on (rows, EB) tiles.

Current scope: practical for moderate orders (p <= ~4 / q1 <= ~8); at p=6 the
fully-unrolled graph exceeds the Mosaic compiler's capacity (SIGKILL during
compile).  Loop-based contractions are the planned fix.  Opt in with
``LocalEvalStrategy.SUM_FACT_PALLAS`` or ``L3STER_TPU_PALLAS=1``; the kernel
computes in float32 (TPU-native precision) regardless of session dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sumfact_const_apply_pallas"]


def _make_kernel(A: np.ndarray, N1: np.ndarray, D1: np.ndarray, EB: int, order: int,
                 q1: int, dim: int, c: int):
    n = order + 1
    d1, n_eq = A.shape[0], A.shape[1]
    N1l, D1l = N1.tolist(), D1.tolist()

    def contract(t, tab, axis, n_in, n_out):
        """Contract spatial `axis` (size n_in) with tab[q][x]; unrolled FMAs."""
        outs = []
        for q in range(n_out):
            acc = None
            for xx in range(n_in):
                coef = tab[q][xx]
                if coef == 0.0:
                    continue
                term = coef * jax.lax.index_in_dim(t, xx, axis, keepdims=False)
                acc = term if acc is None else acc + term
            outs.append(acc)
        return jnp.stack(outs, axis=axis)

    def contract_T(t, tab, axis, n_in, n_out):
        """Transpose contraction: out[x] = sum_q tab[q][x] * t[q]."""
        outs = []
        for xx in range(n_out):
            acc = None
            for q in range(n_in):
                coef = tab[q][xx]
                if coef == 0.0:
                    continue
                term = coef * jax.lax.index_in_dim(t, q, axis, keepdims=False)
                acc = term if acc is None else acc + term
            outs.append(acc)
        return jnp.stack(outs, axis=axis)

    def kernel(x_ref, ji_ref, w_ref, y_ref):
        # x_ref: (1, n^dim, c, EB); ji_ref: (1, Q, dim*dim, EB); w_ref: (1, Q, EB)
        x = x_ref[0]  # (n^dim, c, EB)
        u = x.reshape((n,) * dim + (c, EB))  # leading-dim reshape only
        # ---- backward sweep (axes ordered x, y[, z] = dims 0.. from the right
        # of the spatial block; lattice is x-fastest so axis order is
        # (z, y, x) for dim 3 / (y, x) for dim 2 in leading positions)
        if dim == 3:
            ax = contract(u, N1l, 2, n, q1)
            adx = contract(u, D1l, 2, n, q1)
            b = contract(ax, N1l, 1, n, q1)
            bdy = contract(ax, D1l, 1, n, q1)
            bdx = contract(adx, N1l, 1, n, q1)
            v = contract(b, N1l, 0, n, q1)
            ddz = contract(b, D1l, 0, n, q1)
            ddy = contract(bdy, N1l, 0, n, q1)
            ddx = contract(bdx, N1l, 0, n, q1)
            rder = (ddx, ddy, ddz)
        else:
            ax = contract(u, N1l, 1, n, q1)
            adx = contract(u, D1l, 1, n, q1)
            v = contract(ax, N1l, 0, n, q1)
            ddy = contract(ax, D1l, 0, n, q1)
            ddx = contract(adx, N1l, 0, n, q1)
            rder = (ddx, ddy)

        Q = q1**dim
        vq = v.reshape(Q, c, EB)
        rq = [r.reshape(Q, c, EB) for r in rder]
        ji = ji_ref[0].reshape(Q, dim, dim, EB)
        w = w_ref[0]  # (Q, EB)

        # ---- constant-A per-QP algebra (scalars baked into the code) ----
        pders = [
            [sum(ji[:, j, i] * rq[j][:, u2] for j in range(dim)) for u2 in range(c)]
            for i in range(dim)
        ]
        gq = [[vq[:, u2] for u2 in range(c)]] + pders  # [d][u] -> (Q, EB)

        def dotA(i):
            terms = [
                float(A[d, i, u2]) * gq[d][u2]
                for d in range(d1)
                for u2 in range(c)
                if A[d, i, u2] != 0.0
            ]
            return sum(terms) if terms else jnp.zeros((Q, EB), jnp.float32)

        r = [dotA(i) for i in range(n_eq)]
        rw = [ri * w for ri in r]

        def dotAT(d, u2):
            terms = [float(A[d, i, u2]) * rw[i] for i in range(n_eq) if A[d, i, u2] != 0.0]
            return sum(terms) if terms else jnp.zeros((Q, EB), jnp.float32)

        t0 = jnp.stack([dotAT(0, u2) for u2 in range(c)], axis=1)  # (Q, c, EB)
        tref = [
            jnp.stack(
                [
                    sum(ji[:, j, i] * dotAT(1 + i, u2) for i in range(dim))
                    for u2 in range(c)
                ],
                axis=1,
            )
            for j in range(dim)
        ]

        # ---- forward (transpose) sweep ----
        qsh = (q1,) * dim + (c, EB)
        t0s = t0.reshape(qsh)
        trs = [t.reshape(qsh) for t in tref]
        if dim == 3:
            b = contract_T(t0s, N1l, 0, q1, n) + contract_T(trs[2], D1l, 0, q1, n)
            by = contract_T(trs[1], N1l, 0, q1, n)
            bx = contract_T(trs[0], N1l, 0, q1, n)
            a = contract_T(b, N1l, 1, q1, n) + contract_T(by, D1l, 1, q1, n)
            ax2 = contract_T(bx, N1l, 1, q1, n)
            y = contract_T(a, N1l, 2, q1, n) + contract_T(ax2, D1l, 2, q1, n)
        else:
            a = contract_T(t0s, N1l, 0, q1, n) + contract_T(trs[1], D1l, 0, q1, n)
            ax2 = contract_T(trs[0], N1l, 0, q1, n)
            y = contract_T(a, N1l, 1, q1, n) + contract_T(ax2, D1l, 1, q1, n)

        y_ref[0] = y.reshape(n**dim, c, EB)

    return kernel


def sumfact_const_apply_pallas(
    A_const: np.ndarray,
    ji: jnp.ndarray,  # (E, Q, dim, dim)
    w: jnp.ndarray,  # (E, Q)
    order: int,
    q_order: int,
    dim: int,
    x_loc: jnp.ndarray,  # (E, n_nodes, c)
    block_elems: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused local apply; elements are padded to a multiple of block_elems."""
    from jax.experimental import pallas as pl

    from .sumfact import sumfact_tables_1d

    E, n_nodes, c = x_loc.shape
    q1 = q_order // 2 + 1
    Q = q1**dim
    N1, D1, _ = sumfact_tables_1d(order, q_order)

    EB = min(block_elems, max(8, E))
    n_blocks = -(-E // EB)
    E_pad = n_blocks * EB

    # element-lanes layouts (grid block, features..., EB)
    def to_lanes(a, feat_shape):
        a = a.reshape((E,) + feat_shape).astype(jnp.float32)
        a = jnp.pad(a, [(0, E_pad - E)] + [(0, 0)] * (a.ndim - 1)) if E_pad != E else a
        a = jnp.moveaxis(a.reshape((n_blocks, EB) + feat_shape), 1, -1)
        return a  # (n_blocks, *feat, EB)

    x_t = to_lanes(x_loc, (n_nodes, c))
    ji_t = to_lanes(ji, (Q, dim * dim))
    w_t = to_lanes(w, (Q,))

    kernel = _make_kernel(np.asarray(A_const, np.float64), N1, D1, EB, order, q1, dim, c)
    try:
        from jax.experimental.pallas import tpu as pltpu

        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    except Exception:
        compiler_params = None
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks, n_nodes, c, EB), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, n_nodes, c, EB), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, Q, dim * dim, EB), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, Q, EB), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_nodes, c, EB), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
        compiler_params=compiler_params,
    )(x_t, ji_t, w_t)
    y = jnp.moveaxis(out, -1, 1).reshape(E_pad, n_nodes, c)
    return y[:E].astype(x_loc.dtype)
