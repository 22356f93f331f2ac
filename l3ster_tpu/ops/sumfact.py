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


# -- odd-even (even-odd) decomposition ---------------------------------------
#
# GLL nodes and Gauss points are symmetric about 0, so the 1D tables satisfy
#   N1[Q-1-q, n-1-i] =  N1[q, i]      (values: symmetric)
#   D1[Q-1-q, n-1-i] = -D1[q, i]      (derivatives: antisymmetric)
# Folding inputs into even/odd symmetric halves turns each (Q, n) contraction
# into two half-size contractions, halving the 1D operator work -- the analog
# of ``algsys/SumFactorization.hpp:88-157`` (auto-enabled there for 2<=EO<=6;
# here for every symmetric table).  Disable with ``L3STER_TPU_ODD_EVEN=0``.


def oe_enabled() -> bool:
    import os

    return os.environ.get("L3STER_TPU_ODD_EVEN", "1") not in ("0", "false")


def _oe_halves(M: np.ndarray, anti: bool) -> tuple[np.ndarray, np.ndarray] | None:
    """Half-size (even-input, odd-input) tables of a (anti)symmetric M (O, I).

    Returns None when M lacks the required symmetry (non-symmetric rules).
    """
    O, I = M.shape
    s = -1.0 if anti else 1.0
    if not np.allclose(M[::-1, ::-1], s * M, rtol=0.0, atol=1e-12):
        return None
    Ih = I // 2
    Msym = (M[:, :Ih] + M[:, ::-1][:, :Ih]) / 2.0
    Manti = (M[:, :Ih] - M[:, ::-1][:, :Ih]) / 2.0
    if I % 2:
        Msym = np.concatenate([Msym, M[:, Ih : Ih + 1]], axis=1)  # center col is even
    Oh, Oe = O // 2, (O + 1) // 2
    if not anti:
        return Msym[:Oe], Manti[:Oh]
    return Msym[:Oh], Manti[:Oe]


_TAB_MEMO: dict = {}


def _prep_tab(M: np.ndarray, anti: bool, dtype) -> tuple:
    """(M_dev, Me_dev|None, Mo_dev|None, anti): device tables + OE halves.

    Only NUMPY halves are memoized: device conversion happens per call so no
    trace-bound constant ever escapes into the cache (conversions inside a jit
    trace produce tracers in this JAX version).
    """
    M = np.asarray(M, np.float64)
    key = (M.shape, M.tobytes(), bool(anti))
    hit = _TAB_MEMO.get(key)
    if hit is None:
        hit = _oe_halves(M, anti) if min(M.shape) >= 2 else None
        _TAB_MEMO[key] = hit = (M, *(hit or (None, None)))
    Mnp, Me, Mo = hit
    conv = lambda a: None if a is None else jnp.asarray(a, dtype)  # noqa: E731
    return (conv(Mnp), conv(Me), conv(Mo), anti)


def _contract_last(t: jnp.ndarray, tab) -> jnp.ndarray:
    """Contract the last spatial axis (before the channel axis): t (..., I, c)
    with a table (O, I) -> (..., O, c).  ``tab`` is a plain matrix or a
    ``_prep_tab`` tuple; OE-decomposed tables contract in two half-size
    einsums plus O(I+O) adds."""
    if not isinstance(tab, tuple):
        return jnp.einsum("qn,...nc->...qc", tab, t)
    M, Me, Mo, anti = tab
    if Me is None or not oe_enabled():
        return jnp.einsum("qn,...nc->...qc", M, t)
    O, I = M.shape
    Ih = I // 2
    tf = t[..., :Ih, :]
    tb = jnp.flip(t, axis=-2)[..., :Ih, :]
    te, to = tf + tb, tf - tb
    if I % 2:
        te = jnp.concatenate([te, t[..., Ih : Ih + 1, :]], axis=-2)
    ae = jnp.einsum("qn,...nc->...qc", Me, te)
    ao = jnp.einsum("qn,...nc->...qc", Mo, to)
    Oh = O // 2
    if not anti:
        first = ae[..., :Oh, :] + ao
        mid = ae[..., Oh:, :] if O % 2 else None
        second = jnp.flip(ae[..., :Oh, :] - ao, axis=-2)
    else:
        first = ae + ao[..., :Oh, :]
        mid = ao[..., Oh:, :] if O % 2 else None
        second = jnp.flip(ao[..., :Oh, :] - ae, axis=-2)
    parts = [first] + ([] if mid is None else [mid]) + [second]
    return jnp.concatenate(parts, axis=-2)


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
    N1np, D1np = np.asarray(N1, np.float64), np.asarray(D1, np.float64)
    tN = _prep_tab(N1np, False, u.dtype)
    tD = _prep_tab(D1np, True, u.dtype)
    p1 = N1np.shape[1]
    nq = N1np.shape[0]
    shape = (E,) + (p1,) * dim + (c,)
    t = u.reshape(shape)  # (E, z, y, x, c)

    if dim == 2:
        # contract x then y; keep spatial layout (E, y, x, c) -> outputs lex x-fastest
        ax = _contract_last(t, tN)  # x -> q
        adx = _contract_last(t, tD)
        # move y last: (E, q_x, y, c)
        ax_m, adx_m = jnp.swapaxes(ax, 1, 2), jnp.swapaxes(adx, 1, 2)
        vals = jnp.swapaxes(_contract_last(ax_m, tN), 1, 2)  # (E, q_y, q_x, c)
        ddy = jnp.swapaxes(_contract_last(ax_m, tD), 1, 2)
        ddx = jnp.swapaxes(_contract_last(adx_m, tN), 1, 2)
        Q = nq * nq
        return (
            vals.reshape(E, Q, c),
            jnp.stack([ddx.reshape(E, Q, c), ddy.reshape(E, Q, c)], axis=1),
        )
    if dim == 3:
        ax = _contract_last(t, tN)  # (E, z, y, qx, c)
        adx = _contract_last(t, tD)

        def cy(s, M):  # contract y axis (axis 2)
            return jnp.swapaxes(_contract_last(jnp.swapaxes(s, 2, 3), M), 2, 3)

        b = cy(ax, tN)  # (E, z, qy, qx, c)
        bdy = cy(ax, tD)
        bdx = cy(adx, tN)

        def cz(s, M):  # contract z axis (axis 1)
            return jnp.moveaxis(_contract_last(jnp.moveaxis(s, 1, 3), M), 3, 1)

        vals = cz(b, tN)  # (E, qz, qy, qx, c)
        ddz = cz(b, tD)
        ddy = cz(bdy, tN)
        ddx = cz(bdx, tN)
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
    N1np, D1np = np.asarray(N1, np.float64), np.asarray(D1, np.float64)
    nq = N1np.shape[0]
    p1 = N1np.shape[1]
    tNT = _prep_tab(N1np.T, False, t0.dtype)  # (p+1, q)
    tDT = _prep_tab(D1np.T, True, t0.dtype)

    if dim == 2:
        s0 = t0.reshape(E, nq, nq, c)  # (E, qy, qx, c)
        sx = td[:, 0].reshape(E, nq, nq, c)
        sy = td[:, 1].reshape(E, nq, nq, c)
        # y-stage (axis 1): transpose-contract
        def cy(s, MT):
            return jnp.swapaxes(_contract_last(jnp.swapaxes(s, 1, 2), MT), 1, 2)

        a = cy(s0, tNT) + cy(sy, tDT)  # (E, y, qx, c)
        adx = cy(sx, tNT)
        y = _contract_last(a, tNT) + _contract_last(adx, tDT)  # (E, y, x, c)
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

        b = cz(s0, tNT) + cz(sz, tDT)  # (E, z, qy, qx, c)
        by = cz(sy, tNT)
        bx = cz(sx, tNT)
        a = cy(b, tNT) + cy(by, tDT)  # (E, z, y, qx, c)
        adx = cy(bx, tNT)
        yv = _contract_last(a, tNT) + _contract_last(adx, tDT)
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
    N1np, D1np = np.asarray(N1, np.float64), np.asarray(D1, np.float64)
    nq = N1np.shape[0]
    dt = t0_ch[0].dtype
    tNT = _prep_tab(N1np.T, False, dt)
    tDT = _prep_tab(D1np.T, True, dt)
    c = len(t0_ch)

    if dim == 2:
        sh = (E, nq, nq, 1)  # trailing singleton channel keeps per-channel fusion

        def cy(s, MT):
            return jnp.swapaxes(_contract_last(jnp.swapaxes(s, 1, 2), MT), 1, 2)

        ys = []
        for u in range(c):
            t0 = t0_ch[u].reshape(sh)
            tx, ty = td_ch[0][u].reshape(sh), td_ch[1][u].reshape(sh)
            a = cy(t0, tNT) + cy(ty, tDT)
            ax = cy(tx, tNT)
            ys.append((_contract_last(a, tNT) + _contract_last(ax, tDT)).reshape(E, -1))
        return jnp.stack(ys, axis=-1)
    if dim == 3:
        sh = (E, nq, nq, nq, 1)

        def cz(s, MT):
            return jnp.moveaxis(_contract_last(jnp.moveaxis(s, 1, 3), MT), 3, 1)

        def cy(s, MT):
            return jnp.swapaxes(_contract_last(jnp.swapaxes(s, 2, 3), MT), 2, 3)

        ys = []
        for u in range(c):
            t0 = t0_ch[u].reshape(sh)
            tx = td_ch[0][u].reshape(sh)
            ty = td_ch[1][u].reshape(sh)
            tz = td_ch[2][u].reshape(sh)
            b = cz(t0, tNT) + cz(tz, tDT)
            by = cz(ty, tNT)
            bx = cz(tx, tNT)
            a = cy(b, tNT) + cy(by, tDT)
            ax = cy(bx, tNT)
            ys.append((_contract_last(a, tNT) + _contract_last(ax, tDT)).reshape(E, -1))
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
