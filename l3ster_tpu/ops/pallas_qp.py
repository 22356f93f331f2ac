"""Pallas TPU kernel: fused per-QP least-squares algebra.

Between the two dense basis matmuls (``ops/dense_eval.py``), every QP runs

    g_phys = P(Jinv) g_ref;  r = A g_phys;  t_phys = A^T (w r);  t_ref = P^T t_phys

-- ~10^2 elementwise FMAs per QP on (E*Q,)-long vectors.  As XLA chains these
materialize intermediates in HBM (~0.8ms at the p=6 flagship); this kernel
keeps the whole chain in VMEM/registers: traffic is exactly read g, Jinv, w
and write t (~50MB/s worth, tens of microseconds).

Unlike the retired fully-unrolled sweep kernel, the instruction count here is
independent of the polynomial order (the sweeps stay in the MXU matmuls), so
Mosaic compiles it at any p.

Layout: lanes = flattened (element, QP); rows = the small (dim+1, c) index
space, so every operand row is a perfectly lane-packed VPU stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["qp_algebra_const_pallas"]


def _make_kernel(A: np.ndarray, dim: int, c: int):
    d1, n_eq = A.shape[0], A.shape[1]

    def kernel(g_ref, ji_ref, w_ref, t_ref):
        # g_ref (d1*c, LB); ji_ref (dim*dim, LB); w_ref (1, LB)
        g = [[g_ref[d * c + u] for u in range(c)] for d in range(d1)]
        ji = [[ji_ref[j * dim + i] for i in range(dim)] for j in range(dim)]
        w = w_ref[0]
        pders = [
            [sum(ji[j][i] * g[1 + j][u] for j in range(dim)) for u in range(c)]
            for i in range(dim)
        ]
        gp = [g[0]] + pders

        def dotA(i):
            terms = [
                float(A[d, i, u]) * gp[d][u]
                for d in range(d1)
                for u in range(c)
                if A[d, i, u] != 0.0
            ]
            return sum(terms) if terms else jnp.zeros_like(w)

        rw = [dotA(i) * w for i in range(n_eq)]

        def dotAT(d, u):
            terms = [float(A[d, i, u]) * rw[i] for i in range(n_eq) if A[d, i, u] != 0.0]
            return sum(terms) if terms else jnp.zeros_like(w)

        t = [[dotAT(d, u) for u in range(c)] for d in range(d1)]
        for u in range(c):
            t_ref[u] = t[0][u]
        for j in range(dim):
            for u in range(c):
                t_ref[(1 + j) * c + u] = sum(ji[j][i] * t[1 + i][u] for i in range(dim))

    return kernel


def qp_algebra_const_pallas(
    A_const: np.ndarray,
    g: jnp.ndarray,  # (d1*c, EQ) reference-space values+derivatives
    ji: jnp.ndarray,  # (dim*dim, EQ) inverse Jacobians, lane-major
    w: jnp.ndarray,  # (EQ,) quadrature weights * measure
    dim: int,
    c: int,
    block: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """t (d1*c, EQ): fused P -> A -> w -> A^T -> P^T per-QP chain."""
    from jax.experimental import pallas as pl

    A = np.asarray(A_const, np.float64)
    d1 = dim + 1
    EQ = g.shape[-1]
    LB = min(block, max(512, EQ))
    LB = max(128, (LB // 128) * 128)
    n_blocks = -(-EQ // LB)
    EQp = n_blocks * LB

    def pad(a):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, EQp - EQ)]) if EQp != EQ else a

    g_p, ji_p, w_p = pad(g), pad(ji), pad(w.reshape(1, EQ))
    kernel = _make_kernel(A, dim, c)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d1 * c, EQp), g.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((d1 * c, LB), lambda i: (0, i)),
            pl.BlockSpec((dim * dim, LB), lambda i: (0, i)),
            pl.BlockSpec((1, LB), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((d1 * c, LB), lambda i: (0, i)),
        interpret=interpret,
    )(g_p, ji_p, w_p)
    return out[:, :EQ]
