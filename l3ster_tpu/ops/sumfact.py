"""Sum-factorized tensor-product operator evaluation.

Analog of ``algsys/SumFactorization.hpp``: for Quad/Hex Lagrange elements the
nodes->quadrature interpolation factorizes into 1D contractions, reducing the
matrix-free apply cost from O(p^2d) to O(p^(d+1)) per element.  The sweeps are
batched over elements, so each 1D contraction is a (E * lines, p+1) x
(p+1, n_qp1) matmul -- exactly the shape the MXU wants (the TPU equivalent of
the reference's cache-blocked SIMD sweeps).

Backward sweep (nodes -> QPs) shares partial results between the value and
derivative outputs; the forward sweep is its exact transpose, so the composed
operator stays symmetric (``SumFactorization.hpp:890-917``).

Nodal layout: node index = ix + (p+1)*iy + (p+1)^2*iz, i.e. a reshape to
(..., nz, ny, nx) puts x in the last axis.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..basis.tables import basis_1d
from ..math.gauss import gauss_legendre
from ..math.lagrange import lagrange_derivatives, lagrange_values
from ..mesh.traits import ElementType, native_dim

__all__ = [
    "sumfact_tables_1d",
    "sumfact_interpolate",
    "sumfact_transpose",
    "sumfact_transpose_general",
    "supports_sumfact",
]


@lru_cache(maxsize=None)
def sumfact_tables_1d(order: int, q_order: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(N1, D1, w1): 1D basis values/derivatives at the 1D Gauss points."""
    n1 = q_order // 2 + 1
    x1, w1 = gauss_legendre(n1)
    nodes = basis_1d(order)
    return lagrange_values(nodes, x1), lagrange_derivatives(nodes, x1), w1


def supports_sumfact(et: ElementType) -> bool:
    return et in (ElementType.QUAD, ElementType.HEX)


def _contract_last(t: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """Contract the last spatial axis (before the channel axis) with M (q, n)."""
    # t (..., n, c), M (q, n) -> (..., q, c)
    return jnp.einsum("qn,...nc->...qc", M, t)


def _roll_axis(t: jnp.ndarray) -> jnp.ndarray:
    """Cycle spatial axes so the next one to contract becomes last-before-channel.

    t has layout (E, s_d, ..., s_1, c); move axis 1 to position -2.
    """
    return jnp.moveaxis(t, 1, -2)


def sumfact_interpolate(u: jnp.ndarray, N1: jnp.ndarray, D1: jnp.ndarray, dim: int):
    """Nodes -> QPs: values and reference derivatives.

    u: (E, n_nodes, c) in lexicographic node order.
    Returns vals (E, Q, c) and ders (E, dim, Q, c) with Q = n_q1^dim,
    QP index = qx + n_q1*qy + n_q1^2*qz (same lex convention).
    """
    E, n_nodes, c = u.shape
    p1 = N1.shape[1]
    nq = N1.shape[0]
    shape = (E,) + (p1,) * dim + (c,)
    t = u.reshape(shape)  # (E, z, y, x, c)

    if dim == 2:
        # contract x then y; keep spatial layout (E, y, x, c) -> outputs lex x-fastest
        ax = _contract_last(t, N1)  # x -> q
        adx = _contract_last(t, D1)
        # move y last: (E, q_x, y, c)
        ax_m, adx_m = jnp.swapaxes(ax, 1, 2), jnp.swapaxes(adx, 1, 2)
        vals = jnp.swapaxes(_contract_last(ax_m, N1), 1, 2)  # (E, q_y, q_x, c)
        ddy = jnp.swapaxes(_contract_last(ax_m, D1), 1, 2)
        ddx = jnp.swapaxes(_contract_last(adx_m, N1), 1, 2)
        Q = nq * nq
        return (
            vals.reshape(E, Q, c),
            jnp.stack([ddx.reshape(E, Q, c), ddy.reshape(E, Q, c)], axis=1),
        )
    if dim == 3:
        ax = _contract_last(t, N1)  # (E, z, y, qx, c)
        adx = _contract_last(t, D1)

        def cy(s, M):  # contract y axis (axis 2)
            return jnp.swapaxes(_contract_last(jnp.swapaxes(s, 2, 3), M), 2, 3)

        b = cy(ax, N1)  # (E, z, qy, qx, c)
        bdy = cy(ax, D1)
        bdx = cy(adx, N1)

        def cz(s, M):  # contract z axis (axis 1)
            return jnp.moveaxis(_contract_last(jnp.moveaxis(s, 1, 3), M), 3, 1)

        vals = cz(b, N1)  # (E, qz, qy, qx, c)
        ddz = cz(b, D1)
        ddy = cz(bdy, N1)
        ddx = cz(bdx, N1)
        Q = nq**3
        return (
            vals.reshape(E, Q, c),
            jnp.stack(
                [ddx.reshape(E, Q, c), ddy.reshape(E, Q, c), ddz.reshape(E, Q, c)], axis=1
            ),
        )
    raise ValueError(f"sum factorization supports dim 2/3, got {dim}")


def sumfact_transpose(t0: jnp.ndarray, td: jnp.ndarray, N1: jnp.ndarray, D1: jnp.ndarray, dim: int):
    """QPs -> nodes: exact transpose of :func:`sumfact_interpolate`.

    t0: (E, Q, c) value-part integrand; td: (E, dim, Q, c) reference-space
    derivative parts.  Returns y (E, n_nodes, c).
    """
    E, Q, c = t0.shape
    nq = N1.shape[0]
    p1 = N1.shape[1]
    N1T, D1T = N1.T, D1.T  # (p+1, q)

    if dim == 2:
        s0 = t0.reshape(E, nq, nq, c)  # (E, qy, qx, c)
        sx = td[:, 0].reshape(E, nq, nq, c)
        sy = td[:, 1].reshape(E, nq, nq, c)
        # y-stage (axis 1): transpose-contract
        def cy(s, MT):
            return jnp.swapaxes(_contract_last(jnp.swapaxes(s, 1, 2), MT), 1, 2)

        a = cy(s0, N1T) + cy(sy, D1T)  # (E, y, qx, c)
        adx = cy(sx, N1T)
        y = _contract_last(a, N1T) + _contract_last(adx, D1T)  # (E, y, x, c)
        return y.reshape(E, p1 * p1, c)
    if dim == 3:
        s0 = t0.reshape(E, nq, nq, nq, c)
        sx = td[:, 0].reshape(E, nq, nq, nq, c)
        sy = td[:, 1].reshape(E, nq, nq, nq, c)
        sz = td[:, 2].reshape(E, nq, nq, nq, c)

        def cz(s, MT):
            return jnp.moveaxis(_contract_last(jnp.moveaxis(s, 1, 3), MT), 3, 1)

        def cy(s, MT):
            return jnp.swapaxes(_contract_last(jnp.swapaxes(s, 2, 3), MT), 2, 3)

        b = cz(s0, N1T) + cz(sz, D1T)  # (E, z, qy, qx, c)
        by = cz(sy, N1T)
        bx = cz(sx, N1T)
        a = cy(b, N1T) + cy(by, D1T)  # (E, z, y, qx, c)
        adx = cy(bx, N1T)
        yv = _contract_last(a, N1T) + _contract_last(adx, D1T)
        return yv.reshape(E, p1**3, c)
    raise ValueError(f"sum factorization supports dim 2/3, got {dim}")


def sumfact_transpose_channels(t0_ch, td_ch, N1: jnp.ndarray, D1: jnp.ndarray, dim: int, E: int):
    """Transpose sweep consuming per-channel flat (E*Q,) vectors directly.

    Equivalent to :func:`sumfact_transpose` but avoids stacking the channel
    vectors into an (E, Q, c) tensor first -- the stack breaks XLA's fusion of
    the sweep stages (measured ~2.4ms -> ~0.9ms on the p=6 benchmark).

    t0_ch: list of c vectors (E*Q,); td_ch: [dim][c] vectors (E*Q,).
    Returns y (E, n_nodes, c).
    """
    nq = N1.shape[0]
    N1T, D1T = N1.T, D1.T
    c = len(t0_ch)

    if dim == 2:
        sh = (E, nq, nq)

        def cy(s, MT):
            return jnp.einsum("yr,Erq->Eyq", MT, s)

        def cx(s, MT):
            return jnp.einsum("xq,Eyq->Eyx", MT, s)

        ys = []
        for u in range(c):
            t0 = t0_ch[u].reshape(sh)
            tx, ty = td_ch[0][u].reshape(sh), td_ch[1][u].reshape(sh)
            a = cy(t0, N1T) + cy(ty, D1T)
            ax = cy(tx, N1T)
            ys.append((cx(a, N1T) + cx(ax, D1T)).reshape(E, -1))
        return jnp.stack(ys, axis=-1)
    if dim == 3:
        sh = (E, nq, nq, nq)

        def cz(s, MT):
            return jnp.einsum("zs,Esrq->Ezrq", MT, s)

        def cy(s, MT):
            return jnp.einsum("yr,Ezrq->Ezyq", MT, s)

        def cx(s, MT):
            return jnp.einsum("xq,Ezyq->Ezyx", MT, s)

        ys = []
        for u in range(c):
            t0 = t0_ch[u].reshape(sh)
            tx = td_ch[0][u].reshape(sh)
            ty = td_ch[1][u].reshape(sh)
            tz = td_ch[2][u].reshape(sh)
            b = cz(t0, N1T) + cz(tz, D1T)
            by = cz(ty, N1T)
            bx = cz(tx, N1T)
            a = cy(b, N1T) + cy(by, D1T)
            ax = cy(bx, N1T)
            ys.append((cx(a, N1T) + cx(ax, D1T)).reshape(E, -1))
        return jnp.stack(ys, axis=-1)
    raise ValueError(f"dim must be 2 or 3, got {dim}")


def sumfact_transpose_general(s: jnp.ndarray, axis_tables: list, dim: int) -> jnp.ndarray:
    """Transpose sweep of a scalar QP field with arbitrary per-axis 1D tables.

    s: (E, Q, c); axis_tables[a]: (n_q1, n_out) for axis a (a=0 is x).
    Returns (E, prod(n_out), c) in lexicographic node order.  Used for the
    sum-factorized operator diagonal, where the elementwise basis products
    B_j * B_k factorize into per-axis products of N1/D1 tables.
    """
    E, Q, c = s.shape
    nq = axis_tables[0].shape[0]
    t = s.reshape((E,) + (nq,) * dim + (c,))  # (E, z, y, x, c)
    if dim == 2:
        Tx, Ty = axis_tables
        a = jnp.swapaxes(_contract_last(jnp.swapaxes(t, 1, 2), Ty.T), 1, 2)
        y = _contract_last(a, Tx.T)
        return y.reshape(E, -1, c)
    if dim == 3:
        Tx, Ty, Tz = axis_tables
        b = jnp.moveaxis(_contract_last(jnp.moveaxis(t, 1, 3), Tz.T), 3, 1)
        a = jnp.swapaxes(_contract_last(jnp.swapaxes(b, 2, 3), Ty.T), 2, 3)
        y = _contract_last(a, Tx.T)
        return y.reshape(E, -1, c)
    raise ValueError(f"dim must be 2 or 3, got {dim}")
