"""Dense basis-matrix operator evaluation: the MXU-saturating local apply.

The sum-factorized sweeps (``ops/sumfact.py``, analog of the reference's
``algsys/SumFactorization.hpp``) minimize FLOPs -- the right objective on a
CPU.  On a TPU the bottleneck is not FLOPs but how well the computation maps
onto the 128x128 systolic array: the 1D contractions have tiny contraction
dims (p+1 ~ 7) and run at <1% MXU utilization.  This module instead applies
the FULL reference-basis interpolation matrices

    B_all ((dim+1) * Q, n_nodes)  =  [N; D_1; ...; D_dim]

in ONE large matmul per direction, batched over (element, channel) rows:

    G (E*c, (dim+1) Q) = X (E*c, n_nodes) @ B_all^T            (nodes -> QPs)
    Y (E*c, n_nodes)   = T (E*c, (dim+1) Q) @ B_all            (QPs -> nodes)

This performs O(p^2d) FLOPs per element instead of O(p^(d+1)), but at ~90%
MXU utilization vs ~0.5% -- a net order-of-magnitude win at the flagship
p=6 configuration, and it works for ANY element type (no tensor-product
structure required).  Accuracy: matmuls run at ``Precision.HIGHEST`` (6-pass
bf16 decomposition on TPU, true f32 accumulation), so results match the
sum-factorized path to f32 roundoff.

Between the two matmuls the per-QP least-squares algebra runs as lane-packed
FMA chains on (E*Q,) vectors, exactly as in the sum-factorized path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dense_basis_matrix", "dense_interpolate_channels", "dense_transpose_channels"]

def _mxu_precision():
    """MXU matmul precision for the f32 apply paths.

    Default HIGH (bf16x3: f32-grade matmul accuracy at half the MXU passes of
    HIGHEST's 6; measured ~15% faster end-to-end apply on v5e).  Set
    L3STER_TPU_MXU_PRECISION=highest to force the 6-pass mode.
    """
    import os

    name = os.environ.get("L3STER_TPU_MXU_PRECISION", "high").lower()
    return {
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[name]


_PREC = _mxu_precision()


def dense_basis_matrix(tables) -> np.ndarray:
    """B_all ((dim+1)*Q, n_nodes): basis values then per-axis ref derivatives."""
    V = np.asarray(tables.values, np.float64)  # (Q, n)
    D = np.moveaxis(np.asarray(tables.ref_ders, np.float64), 1, 0)  # (dim, Q, n)
    return np.concatenate([V[None], D], axis=0).reshape(-1, V.shape[1])


def dense_interpolate_channels(x_loc: jnp.ndarray, Ball: jnp.ndarray, dim: int):
    """Nodes -> QPs via one dense matmul.

    x_loc (E, n_nodes, c); Ball ((dim+1)Q, n_nodes).
    Returns (vals_l, rd): vals_l[u] -> (E*Q,) values; rd[j][u] -> (E*Q,)
    reference derivatives along axis j (E-major flattening, matching the
    lane-packed w_t/Ji_t layout of ``pack_sumfact_operator``).
    """
    E, n, c = x_loc.shape
    d1 = dim + 1
    Q = Ball.shape[0] // d1
    x2 = jnp.swapaxes(x_loc, 1, 2).reshape(E * c, n)
    G = jnp.matmul(x2, Ball.T, precision=_PREC)  # (E*c, d1*Q)
    G4 = G.reshape(E, c, d1, Q)
    vals_l = [G4[:, u, 0].reshape(E * Q) for u in range(c)]
    rd = [[G4[:, u, 1 + j].reshape(E * Q) for u in range(c)] for j in range(dim)]
    return vals_l, rd


def dense_transpose_channels(t0_ch, td_ch, Ball: jnp.ndarray, E: int) -> jnp.ndarray:
    """QPs -> nodes: exact transpose of :func:`dense_interpolate_channels`.

    t0_ch: list of c (E*Q,) value-part integrands; td_ch: [dim][c] (E*Q,)
    reference-space derivative parts.  Returns y (E, n_nodes, c).
    """
    c = len(t0_ch)
    dim = len(td_ch)
    d1 = dim + 1
    Q = t0_ch[0].shape[0] // E
    n = Ball.shape[1]
    T = jnp.stack([jnp.stack(ch) for ch in ([t0_ch] + list(td_ch))])  # (d1, c, E*Q)
    T = jnp.transpose(T.reshape(d1, c, E, Q), (2, 1, 0, 3)).reshape(E * c, d1 * Q)
    y2 = jnp.matmul(T, Ball, precision=_PREC)  # (E*c, n)
    return jnp.swapaxes(y2.reshape(E, c, n), 1, 2)
