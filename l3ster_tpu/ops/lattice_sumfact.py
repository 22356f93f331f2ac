"""Global banded sum-factorization on structured node lattices.

The fastest TPU formulation of the tensor-product matrix-free apply found in
this project (measured ~2.8x faster than per-element dense matmuls at the
p=6 flagship): when the mesh block is a structured lattice
(``ops/lattice.py``), the nodes->QP interpolation of ALL elements along one
axis is a single block-banded matrix

    Ng (ne*q1, n1),   Ng[e*q1 + q, e*p + i] = N1[q, i]

applied to the GLOBAL lattice tensor -- one large-K matmul per axis per
sweep, with no per-element duplication, no gathers, and no interleave
transposes.  QP space comes out in interleaved order (ez qz, ey qy, ex qx);
the per-QP geometry tensors are pre-permuted to match, so the least-squares
algebra is unchanged.

This is sum-factorization applied globally: O(p^(d+1)) FLOPs per element
like the reference's ``algsys/SumFactorization.hpp``, but with contraction
dim K = n1 (the whole lattice axis) so the MXU stays fed.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "banded_tables",
    "lattice_qp_perm",
    "lattice_interp",
    "lattice_transpose",
    "local_apply_lattice",
    "pack_face_banded",
    "face_apply_banded",
]

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


def _bf163_stages(dtype) -> bool:
    """K-stacked manual bf16x3 for the XLA sweep stages (TPU f32 + HIGH).

    A HIGH-precision einsum with K = n1 (37 at the p=6 flagship) runs 3 MXU
    passes each padding K to 128 (~29% utilization).  Stacking the bf16x3
    expansion into the contraction dim — table ``[Th; Th; Tl]`` against input
    ``[Xh; Xl; Xh]`` — computes the same sum in ONE pass at 3K=111 of 128.

    MEASURED OFF by default (L3STER_TPU_XLA_BF163=1 to enable): at the p=6
    flagship the XLA-stage conversions + K-concats materialize in HBM and
    cost more than the saved passes (0.212 vs 0.145 ms/apply, 2026-08-20) —
    the same copies-beat-passes tradeoff as [N|D] packing and KPACK.  Inside
    the Pallas kernel the identical trick WINS (operands already live in
    VMEM); see ops/pallas_zsweep2._split_stack.
    """
    import os

    return (
        jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and _PREC == jax.lax.Precision.HIGH
        and os.environ.get("L3STER_TPU_XLA_BF163", "0") not in ("0", "", "false")
    )


def _xstack(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Input operand of the K-stacked bf16x3 dot: [Xh; Xl; Xh] along axis.

    The hi part is built by BITMASK truncation onto the bf16 grid, not a
    bf16 convert round-trip: XLA:TPU elides ``f32(bf16(x))`` pairs feeding a
    dot (excess-precision simplification), which silently zeroes the lo term
    (measured: 1.8e-3 error, i.e. plain-bf16 class, vs 1.0e-5 with the mask).
    """
    xh_f32 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    xl = (x - xh_f32).astype(jnp.bfloat16)
    xh = xh_f32.astype(jnp.bfloat16)  # exact: xh_f32 lies on the bf16 grid
    return jnp.concatenate([xh, xl, xh], axis=axis)


def _tstack(T: np.ndarray, axis: int = 0) -> np.ndarray:
    """Table operand: [Th; Th; Tl] along the contraction axis (host numpy)."""
    import ml_dtypes

    hi = np.asarray(T, np.float32)
    hib = hi.astype(ml_dtypes.bfloat16)
    lob = (hi - hib.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.concatenate([hib, hib, lob], axis=axis)


def _ein3(spec: str, x3: jnp.ndarray, T3: jnp.ndarray) -> jnp.ndarray:
    """einsum on pre-stacked bf16 operands, f32 accumulate, single pass."""
    return jnp.einsum(
        spec, x3, T3,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


@lru_cache(maxsize=None)
def banded_tables(order: int, q_order: int, ne: int) -> tuple[np.ndarray, np.ndarray]:
    """(Ng, Dg) block-banded global 1D tables, each (ne*q1, ne*order + 1)."""
    from .sumfact import sumfact_tables_1d

    N1, D1, _ = sumfact_tables_1d(order, q_order)
    q1, n = N1.shape
    Ng = np.zeros((ne * q1, ne * order + 1))
    Dg = np.zeros_like(Ng)
    for e in range(ne):
        Ng[e * q1 : (e + 1) * q1, e * order : e * order + n] = N1
        Dg[e * q1 : (e + 1) * q1, e * order : e * order + n] = D1
    return Ng, Dg


def lattice_qp_perm(ne: tuple, q1: int, eidx_inv=None) -> np.ndarray:
    """perm (E*Q,): interleaved QP linear index -> block E-major index.

    Use as ``arr_interleaved = arr_emajor[..., perm]``.  E-major index is
    ``e * Q + (qx + q1*qy [+ q1^2*qz])`` with canonical element order
    ``e = ex + nex*(ey [+ ney*ez])``; ``eidx_inv`` maps canonical element
    index -> block element index for non-canonical block orders.
    """
    dim = len(ne)
    Q = q1**dim
    if dim == 2:
        ex, qx = np.meshgrid(np.arange(ne[0]), np.arange(q1), indexing="ij")
        Qxn = (ex * q1 + qx).reshape(-1)  # (ne_x*q1,)
        ey, qy = np.meshgrid(np.arange(ne[1]), np.arange(q1), indexing="ij")
        Ryn = (ey * q1 + qy).reshape(-1)
        # interleaved linear = Ry * (nex*q1) + Qx; decompose back to (e, q)
        Ry = Ryn[:, None]
        Qx = Qxn[None, :]
        e = (Qx // q1) + ne[0] * (Ry // q1)
        q = (Qx % q1) + q1 * (Ry % q1)
    else:
        r = np.arange(ne[0] * q1)
        s = np.arange(ne[1] * q1)
        t = np.arange(ne[2] * q1)
        Qx = r[None, None, :]
        Ry = s[None, :, None]
        Sz = t[:, None, None]
        e = (Qx // q1) + ne[0] * ((Ry // q1) + ne[1] * (Sz // q1))
        q = (Qx % q1) + q1 * ((Ry % q1) + q1 * (Sz % q1))
    if eidx_inv is not None:
        e = np.asarray(eidx_inv)[e]
    return (e * Q + q).reshape(-1).astype(np.int64)


def _kpack_group(n1x: int, Qx: int) -> int:
    """Line-batching group size for the x-stage matmuls.

    The banded x table is (n1x, Qx) — at the flagship (37, 42) the MXU pads
    both to 128.  Packing g consecutive y-lines into one row with a
    block-diagonal table (g*n1x, g*Qx) raises tile utilization ~g-fold; the
    (y, x) -> (y/g, g*x) regroup is a FREE reshape (x is minor).

    MEASURED OFF by default: interleaved flagship A/B (TPU v5e, 2x each)
    gave 0.306/0.318 ms unpacked vs 0.322/0.321 ms packed — the x-stage
    matmul cost is dominated by streaming the M=c*z*y rows (K/N padding of
    the small stationary table is nearly free), so the pad/reshape copies
    outweigh the pass savings.  Kept behind L3STER_TPU_KPACK=1 for larger-c
    systems where the tradeoff may flip.
    """
    import os

    if os.environ.get("L3STER_TPU_KPACK", "0") in ("0", "false"):
        return 1
    return max(1, min(128 // n1x, 128 // Qx))


@lru_cache(maxsize=None)
def _blockdiag_tables(order: int, q_order: int, ne_a: int, g: int):
    """Block-diagonal stack of g copies of the banded (NgT, DgT) tables."""
    Ng, Dg = banded_tables(order, q_order, ne_a)  # (Qa, n1)
    n1, Qa = Ng.shape[1], Ng.shape[0]
    N3 = np.zeros((g * n1, g * Qa))
    D3 = np.zeros_like(N3)
    for j in range(g):
        N3[j * n1 : (j + 1) * n1, j * Qa : (j + 1) * Qa] = Ng.T
        D3[j * n1 : (j + 1) * n1, j * Qa : (j + 1) * Qa] = Dg.T
    return N3, D3


def _tabs(order: int, q_order: int, ne: tuple, dtype):
    out = []
    for ne_a in ne:
        Ng, Dg = banded_tables(order, q_order, ne_a)
        out.append((jnp.asarray(Ng.T, dtype), jnp.asarray(Dg.T, dtype)))
    return out  # per axis: (NgT (n1, Qa), DgT)


def lattice_interp(t: jnp.ndarray, tabs):
    """Global lattice tensor (c, n1_d, ..., n1_x) -> vals + per-axis ref ders,
    each (c, Q_d, ..., Q_x) in interleaved QP order.

    Channel-LEADING layout throughout: the minor dims stay lattice axes (well
    lane-packed) and the (d1*c, EQ) stacking for the fused per-QP kernel is a
    row concatenation, never a transpose."""
    dim = len(tabs)
    if dim == 2:
        (NxT, DxT), (NyT, DyT) = tabs
        ax = jnp.einsum("cyx,xQ->cyQ", t, NxT, precision=_PREC)
        adx = jnp.einsum("cyx,xQ->cyQ", t, DxT, precision=_PREC)
        v = jnp.einsum("cyQ,yR->cRQ", ax, NyT, precision=_PREC)
        dy = jnp.einsum("cyQ,yR->cRQ", ax, DyT, precision=_PREC)
        dx = jnp.einsum("cyQ,yR->cRQ", adx, NyT, precision=_PREC)
        return v, (dx, dy)
    (NxT, DxT), (NyT, DyT), (NzT, DzT) = tabs
    ax = jnp.einsum("czyx,xQ->czyQ", t, NxT, precision=_PREC)
    adx = jnp.einsum("czyx,xQ->czyQ", t, DxT, precision=_PREC)
    b = jnp.einsum("czyQ,yR->czRQ", ax, NyT, precision=_PREC)
    bdy = jnp.einsum("czyQ,yR->czRQ", ax, DyT, precision=_PREC)
    bdx = jnp.einsum("czyQ,yR->czRQ", adx, NyT, precision=_PREC)
    v = jnp.einsum("czRQ,zS->cSRQ", b, NzT, precision=_PREC)
    dz = jnp.einsum("czRQ,zS->cSRQ", b, DzT, precision=_PREC)
    dy = jnp.einsum("czRQ,zS->cSRQ", bdy, NzT, precision=_PREC)
    dx = jnp.einsum("czRQ,zS->cSRQ", bdx, NzT, precision=_PREC)
    return v, (dx, dy, dz)


def lattice_transpose(t0: jnp.ndarray, td, tabs):
    """Exact transpose of :func:`lattice_interp`: interleaved QP tensors
    (t0 values part, td per-axis derivative parts, all channel-leading) ->
    (c, n1_d, ..., n1_x)."""
    dim = len(tabs)
    if dim == 2:
        (NxT, DxT), (NyT, DyT) = tabs
        a = jnp.einsum("cRQ,yR->cyQ", t0, NyT, precision=_PREC) + jnp.einsum(
            "cRQ,yR->cyQ", td[1], DyT, precision=_PREC
        )
        adx = jnp.einsum("cRQ,yR->cyQ", td[0], NyT, precision=_PREC)
        return jnp.einsum("cyQ,xQ->cyx", a, NxT, precision=_PREC) + jnp.einsum(
            "cyQ,xQ->cyx", adx, DxT, precision=_PREC
        )
    (NxT, DxT), (NyT, DyT), (NzT, DzT) = tabs
    b = jnp.einsum("cSRQ,zS->czRQ", t0, NzT, precision=_PREC) + jnp.einsum(
        "cSRQ,zS->czRQ", td[2], DzT, precision=_PREC
    )
    bdy = jnp.einsum("cSRQ,zS->czRQ", td[1], NzT, precision=_PREC)
    bdx = jnp.einsum("cSRQ,zS->czRQ", td[0], NzT, precision=_PREC)
    a = jnp.einsum("czRQ,yR->czyQ", b, NyT, precision=_PREC) + jnp.einsum(
        "czRQ,yR->czyQ", bdy, DyT, precision=_PREC
    )
    adx = jnp.einsum("czRQ,yR->czyQ", bdx, NyT, precision=_PREC)
    return jnp.einsum("czyQ,xQ->czyx", a, NxT, precision=_PREC) + jnp.einsum(
        "czyQ,xQ->czyx", adx, DxT, precision=_PREC
    )


def _permute_geom_qr(geom_t, S: int, R: int, Q: int):
    """Re-order the packed per-QP geometry's lane plane from R-major (RQ) to
    Q-major (QR).  The z-sweep kernel's lane axis is opaque, so feeding it
    QR-ordered inputs + QR-ordered geometry computes the identical result —
    and the y-stage dot outputs land in QR order for free (no transposes)."""

    def p2(v):  # (..., R*Q) -> (..., Q*R)
        sh = v.shape[:-1]
        return jnp.swapaxes(v.reshape(sh + (R, Q)), -1, -2).reshape(sh + (Q * R,))

    if geom_t[0] == "diag":
        _, jx, jy, jz, wyx, wz = geom_t
        return ("diag", p2(jx), p2(jy), jz, p2(wyx), wz)
    _, ji, w = geom_t
    return ("full", p2(ji), p2(w))


def _apply_xy_pallas(
    A_const, t, geom_t, order: int, q_order: int, ne: tuple, qsh: tuple,
    interpret: bool,
):
    """Constant-coefficient 3D volume apply with ALL sweep stages as Pallas
    kernels (VMEM bf16x3 packing; see ops/pallas_stages.py) around the fused
    z-sweep.  t is the channel-leading (c, n1z, n1y, n1x) lattice tensor;
    returns the same layout."""
    from .pallas_stages import kc_transpose_tables, kstacked_matmul, stage_tables
    from .pallas_zsweep2 import fused_z_sweep_v2

    c, n1z, n1y, n1x = t.shape
    S, R, Q = qsh
    split = t.dtype == jnp.float32 and not interpret
    czy = c * n1z * n1y
    czQ = c * n1z * Q

    # ---- x interpolation: ONE [N|D]-paired K-stacked dot
    TxND = stage_tables(order, q_order, ne[0], "ND", split)
    axd = kstacked_matmul(t.reshape(czy, n1x), None, TxND, 2 * Q, interpret)
    ax = axd[:, :Q].reshape(c, n1z, n1y, Q)
    adx = axd[:, Q:].reshape(c, n1z, n1y, Q)
    # ---- y interpolation on (c, z, Q, y) rows; outputs in QR lane order
    axT = jnp.swapaxes(ax, 2, 3).reshape(czQ, n1y)
    adxT = jnp.swapaxes(adx, 2, 3).reshape(czQ, n1y)
    TyND = stage_tables(order, q_order, ne[1], "ND", split)
    TyN = stage_tables(order, q_order, ne[1], "N", split)
    bqd = kstacked_matmul(axT, None, TyND, 2 * R, interpret)
    bdxq = kstacked_matmul(adxT, None, TyN, R, interpret)
    b = bqd[:, :R].reshape(c, n1z, Q * R)
    bdy = bqd[:, R:].reshape(c, n1z, Q * R)
    bdx = bdxq.reshape(c, n1z, Q * R)
    # ---- fused z-sweep + QP algebra + z-transpose, QR-permuted geometry
    Ngz, Dgz = banded_tables(order, q_order, ne[2])
    NzT = jnp.asarray(Ngz.T, t.dtype)
    DzT = jnp.asarray(Dgz.T, t.dtype)
    a, ady, adxz = fused_z_sweep_v2(
        None if A_const is None else np.asarray(A_const),
        b, bdy, bdx, _permute_geom_qr(geom_t, S, R, Q), NzT, DzT,
        interpret=interpret,
        host_tables=(Ngz.T, Dgz.T),
        layout="cz",
    )
    # ---- y transpose: rows are ALREADY (c, z, Q): K-concat pair dot
    TyKC = kc_transpose_tables(order, q_order, ne[1], split)
    TyNT = stage_tables(order, q_order, ne[1], "NT", split)
    a2q = kstacked_matmul(a.reshape(czQ, R), ady.reshape(czQ, R), TyKC, n1y, interpret)
    adx2q = kstacked_matmul(adxz.reshape(czQ, R), None, TyNT, n1y, interpret)
    # ---- x transpose on (c, z, y, Q) rows
    a2 = jnp.swapaxes(a2q.reshape(c, n1z, Q, n1y), 2, 3).reshape(czy, Q)
    adx2 = jnp.swapaxes(adx2q.reshape(c, n1z, Q, n1y), 2, 3).reshape(czy, Q)
    TxKC = kc_transpose_tables(order, q_order, ne[0], split)
    y = kstacked_matmul(a2, adx2, TxKC, n1x, interpret)
    return y.reshape(c, n1z, n1y, n1x)


def pack_face_banded(A, w, fp: dict, order: int, q_order: int):
    """Pack a value-only boundary contribution for the banded face apply.

    A (E, Q, 1, n_eq, c) and w (E, Q) are the direct-path tensors in BLOCK
    element order (node-restricted to the side's surface nodes); returns
    (A_l (n_eq, c, EQ), w_l (EQ,)) in interleaved face-QP order matching the
    global banded 2D interpolation of the face lattice plane.  Returns None
    when the contribution is not value-only (derivative faces keep the
    batched direct path)."""
    A = np.asarray(A)
    w = np.asarray(w)
    if A.ndim != 5 or A.shape[2] != 1:
        return None
    E, Q, _, n_eq, c = A.shape
    q1 = q_order // 2 + 1
    ne2 = fp["plan2d"][1]
    if len(ne2) != 2 or Q != q1 ** len(ne2) or E != int(np.prod(ne2)):
        return None
    finv = fp["plan2d"][3]
    perm = lattice_qp_perm(tuple(ne2), q1, eidx_inv=finv)
    A_l = A.reshape(E * Q, n_eq, c)[perm].transpose(1, 2, 0)
    w_l = w.reshape(E * Q)[perm]
    return A_l, w_l


def face_apply_banded(
    A_l: jnp.ndarray,  # (n_eq, c, EQ) interleaved face-QP order
    w_l: jnp.ndarray,  # (EQ,)
    fp: dict,
    order: int,
    q_order: int,
    plane: jnp.ndarray,  # (c,) + reversed(n12) channel-leading face plane
) -> jnp.ndarray:
    """Value-only boundary contribution on a full lattice side as ONE global
    banded 2D sweep over the face plane (c, n1_b, n1_a) -> same shape.

    Replaces 4 tiny batched per-element einsums + window extraction +
    overlap-add with 4 face-wide matmuls: the per-element direct path pads
    each (Q, n_nodes) tile to the MXU and is latency-bound at ~36 elements
    (measured ~30us/face at the p=6 flagship vs ~2us here)."""
    n12 = fp["plan2d"][0]
    ne2 = fp["plan2d"][1]
    c = plane.shape[0]
    tabs = _tabs(order, q_order, ne2, plane.dtype)
    (NaT, _), (NbT, _) = tabs
    a = jnp.einsum("cyx,xQ->cyQ", plane, NaT, precision=_PREC)
    v = jnp.einsum("cyQ,yR->cRQ", a, NbT, precision=_PREC)
    R, Q = v.shape[1], v.shape[2]
    vf = v.reshape(c, R * Q)
    r = jnp.einsum("icq,cq->iq", A_l, vf, precision=_PREC) * w_l[None, :]
    tt = jnp.einsum("icq,iq->cq", A_l, r, precision=_PREC).reshape(c, R, Q)
    b = jnp.einsum("cRQ,yR->cyQ", tt, NbT, precision=_PREC)
    return jnp.einsum("cyQ,xQ->cyx", b, NaT, precision=_PREC)


def local_apply_lattice(
    A_const,  # (dim+1, n_eq, c) numpy for const kernels, or None
    A_t,  # (dim+1, n_eq, c, EQ) interleaved-order device tensor, or None
    Ji_l: jnp.ndarray,  # (dim, dim, EQ) interleaved order (None with geom)
    w_l: jnp.ndarray,  # (EQ,) interleaved order (None with geom)
    order: int,
    q_order: int,
    n1: tuple,
    ne: tuple,
    x: jnp.ndarray,  # (n_rows, c) global lattice node rows
    geom: tuple | None = None,  # ("diag", jx, jy, jz, wyx, wz) factorized geometry
    tensor_io: bool = False,  # x IS the channel-leading tensor; return same
    var: tuple | None = None,  # (nz_idx, A_nz (K, EQ), n_eq) variable coefficients
) -> jnp.ndarray:
    """Full constrained-free local apply on the global lattice; (n_rows, c).

    With ``tensor_io`` the caller owns the (c, n1_d, ..., n1_x) layout: x is
    the channel-leading lattice tensor and the result is returned in the same
    layout, so a lattice GROUP (volume + boundary faces sharing one lattice)
    pays exactly one entry/exit transpose per apply (see raw_parts)."""
    import os

    from ..algsys.local import _qp_algebra_const, _qp_algebra_packed

    dim = len(n1)
    c = x.shape[0] if tensor_io else x.shape[-1]
    q1 = q_order // 2 + 1
    tabs = _tabs(order, q_order, ne, x.dtype)
    # single entry transpose to channel-leading; everything downstream keeps
    # lattice axes minor (lane-packed) so channel stacks are row views
    t = x if tensor_io else x.T.reshape((c,) + tuple(reversed(n1)))
    qsh = tuple(q1 * n for n in reversed(ne))
    fused_z = geom is not None or (
        (A_const is not None or var is not None)
        and dim == 3
        and jax.default_backend() == "tpu"
        and os.environ.get("L3STER_TPU_FUSED_Z", "1") not in ("0", "false")
    )
    if fused_z:
        # x/y interp stages in XLA, then the fused Pallas z-sweep + per-QP
        # algebra + z-transpose (ops/pallas_zsweep2.py), then y/x transpose
        # stages in XLA.  Avoids materializing the four largest QP-space
        # tensors and the FMA-chain intermediates in HBM.
        from .pallas_zsweep2 import fused_z_sweep_v2

        (NxT, DxT), (NyT, DyT), (NzT, DzT) = tabs
        S, R, Q = qsh
        n1z = t.shape[1]
        # VMEM-packed sweep stages (ops/pallas_stages.py): every x/y stage
        # matmul runs as a Pallas kernel with bf16x3 splitting + K-stacking
        # done in VMEM and [N|D] table pairing — the round-4 "packing wins
        # only in VMEM" conclusion applied to the whole pipeline.  The
        # z-kernel's QP lanes ride in Q-major (QR) order on this path, so the
        # y-stage outputs and y-transpose inputs need no HBM transposes.
        #
        # MEASURED OFF by default (L3STER_TPU_XY_PALLAS=1 to enable): clean
        # A/B at the p=6 flagship (benchmarks/probe_newpath.py, 2026-08-21):
        # 0.274 ms/apply vs 0.145 ms for the XLA einsum stages, despite each
        # stage kernel running 3.5 us in ISOLATION (6x faster than its XLA
        # pair).  The composition loses: the 7 custom-call boundaries force
        # HBM materialization of every inter-stage relayout (transposes,
        # lane slices, pads) that XLA otherwise fuses INTO its einsums, and
        # serialize scheduling — ~190 us of composition tax against ~60 us
        # of MXU-pass savings.  See BENCH_SWEEP.md round-5 for the full
        # floor analysis; the surviving fusion design is the single z-sweep
        # kernel (everything else stays XLA).
        xy_pallas = (
            var is None
            and _kpack_group(t.shape[3], Q) == 1
            and os.environ.get("L3STER_TPU_XY_PALLAS", "0") in ("1", "true")
        )
        if xy_pallas:
            geom_t = geom if geom is not None else (
                "full",
                Ji_l.reshape(dim * dim, S, R * Q),
                w_l.reshape(S, R * Q),
            )
            y = _apply_xy_pallas(
                A_const, t, geom_t, order, q_order, ne, qsh,
                interpret=jax.default_backend() == "cpu",
            )
            return y if tensor_io else y.reshape(c, -1).T.reshape(x.shape)
        # NOTE: [N|D] table packing (one matmul with doubled free/contraction
        # dim) was tried here and measured SLOWER (0.322 vs 0.299 ms at the
        # flagship): the concat/slice copies outweigh the MXU pass savings
        n1y, n1x = t.shape[2], t.shape[3]
        g = _kpack_group(n1x, Q)
        if g > 1:
            # block-diagonal line batching: pack g consecutive y-lines into
            # one matmul row (free reshape, x minor), raising the x-stage
            # MXU tile utilization ~g-fold; the y tables are zero-row padded
            # so the padded y rows flow through the y stages as exact zeros
            n1yp = -(-n1y // g) * g
            tp = jnp.pad(t, ((0, 0), (0, 0), (0, n1yp - n1y), (0, 0)))
            tp = tp.reshape(c, n1z, n1yp // g, g * n1x)
            N3, D3 = _blockdiag_tables(order, q_order, ne[0], g)
            N3 = jnp.asarray(N3, t.dtype)
            D3 = jnp.asarray(D3, t.dtype)
            ax = jnp.einsum("czgk,kQ->czgQ", tp, N3, precision=_PREC).reshape(
                c, n1z, n1yp, Q
            )
            adx0 = jnp.einsum("czgk,kQ->czgQ", tp, D3, precision=_PREC).reshape(
                c, n1z, n1yp, Q
            )
            if n1yp != n1y:
                NyT = jnp.pad(NyT, ((0, n1yp - n1y), (0, 0)))
                DyT = jnp.pad(DyT, ((0, n1yp - n1y), (0, 0)))
        else:
            bf163 = _bf163_stages(t.dtype)
            if bf163:
                Ngx, Dgx = banded_tables(order, q_order, ne[0])
                NxT3 = jnp.asarray(_tstack(Ngx.T, 0))  # (3*n1x, Q)
                DxT3 = jnp.asarray(_tstack(Dgx.T, 0))
                t3 = _xstack(t, axis=3)
                ax = _ein3("czyx,xQ->czyQ", t3, NxT3)
                adx0 = _ein3("czyx,xQ->czyQ", t3, DxT3)
            else:
                ax = jnp.einsum("czyx,xQ->czyQ", t, NxT, precision=_PREC)
                adx0 = jnp.einsum("czyx,xQ->czyQ", t, DxT, precision=_PREC)
        geom_t = geom if geom is not None else (
            "full",
            Ji_l.reshape(dim * dim, S, R * Q),
            w_l.reshape(S, R * Q),
        )
        if var is None and os.environ.get("L3STER_TPU_ZSWEEP", "v2") == "v1":
            from .pallas_zsweep import fused_z_sweep

            if geom is not None:
                raise ValueError("v1 z-sweep has no factorized-geometry path")
            b = jnp.einsum("czyQ,yR->zcRQ", ax, NyT, precision=_PREC).reshape(n1z, c, R * Q)
            bdy = jnp.einsum("czyQ,yR->zcRQ", ax, DyT, precision=_PREC).reshape(n1z, c, R * Q)
            bdx = jnp.einsum("czyQ,yR->zcRQ", adx0, NyT, precision=_PREC).reshape(n1z, c, R * Q)
            a, ady, adx = fused_z_sweep(
                np.asarray(A_const), b, bdy, bdx,
                Ji_l.reshape(dim * dim, S, R * Q), w_l.reshape(S, R * Q),
                NzT, DzT,
            )
            a = a.reshape(n1z, c, R, Q)
            ady = ady.reshape(n1z, c, R, Q)
            adx = adx.reshape(n1z, c, R, Q)
            a2 = jnp.einsum("zcRQ,yR->czyQ", a, NyT, precision=_PREC) + jnp.einsum(
                "zcRQ,yR->czyQ", ady, DyT, precision=_PREC
            )
            adx2 = jnp.einsum("zcRQ,yR->czyQ", adx, NyT, precision=_PREC)
        else:
            # NATURAL-layout handoff: the y-stage einsums keep their (c, z)
            # batch order (no transpose-on-write) and the kernel's cz blocks
            # need no pad+moveaxis relayout on either side
            if g == 1 and _bf163_stages(t.dtype):
                Ngy, Dgy = banded_tables(order, q_order, ne[1])
                NyT3 = jnp.asarray(_tstack(Ngy.T, 0))  # (3*n1y, R)
                DyT3 = jnp.asarray(_tstack(Dgy.T, 0))
                ax3 = _xstack(ax, axis=2)
                adx03 = _xstack(adx0, axis=2)
                b = _ein3("czyQ,yR->czRQ", ax3, NyT3).reshape(c, n1z, R * Q)
                bdy = _ein3("czyQ,yR->czRQ", ax3, DyT3).reshape(c, n1z, R * Q)
                bdx = _ein3("czyQ,yR->czRQ", adx03, NyT3).reshape(c, n1z, R * Q)
            else:
                b = jnp.einsum("czyQ,yR->czRQ", ax, NyT, precision=_PREC).reshape(c, n1z, R * Q)
                bdy = jnp.einsum("czyQ,yR->czRQ", ax, DyT, precision=_PREC).reshape(c, n1z, R * Q)
                bdx = jnp.einsum("czyQ,yR->czRQ", adx0, NyT, precision=_PREC).reshape(c, n1z, R * Q)
            Ngz, Dgz = banded_tables(order, q_order, ne[2])  # host numpy
            var_t = None
            if var is not None:
                nz_idx, A_nz, n_eq_v = var
                var_t = (nz_idx, A_nz.reshape(-1, S, R * Q), n_eq_v)
            a, ady, adx = fused_z_sweep_v2(
                None if A_const is None else np.asarray(A_const),
                b, bdy, bdx, geom_t, NzT, DzT,
                interpret=jax.default_backend() == "cpu",
                host_tables=(Ngz.T, Dgz.T),
                var=var_t,
                layout="cz",
            )
            a = a.reshape(c, n1z, R, Q)
            ady = ady.reshape(c, n1z, R, Q)
            adx = adx.reshape(c, n1z, R, Q)
            if g == 1 and _bf163_stages(t.dtype):
                Ngy, Dgy = banded_tables(order, q_order, ne[1])
                # fold the N/D transpose PAIR into one K-stacked dot: K = 6R
                NDyT3 = jnp.asarray(
                    np.concatenate([_tstack(Ngy.T, 1), _tstack(Dgy.T, 1)], axis=1)
                )  # (n1y, 6R)
                NyTb3 = jnp.asarray(_tstack(Ngy.T, 1))  # (n1y, 3R)
                a2 = _ein3(
                    "czRQ,yR->czyQ",
                    jnp.concatenate([_xstack(a, 2), _xstack(ady, 2)], axis=2),
                    NDyT3,
                )
                adx2 = _ein3("czRQ,yR->czyQ", _xstack(adx, 2), NyTb3)
            else:
                a2 = jnp.einsum("czRQ,yR->czyQ", a, NyT, precision=_PREC) + jnp.einsum(
                    "czRQ,yR->czyQ", ady, DyT, precision=_PREC
                )
                adx2 = jnp.einsum("czRQ,yR->czyQ", adx, NyT, precision=_PREC)
        if g > 1:
            a2g = a2.reshape(c, n1z, n1yp // g, g * Q)
            adx2g = adx2.reshape(c, n1z, n1yp // g, g * Q)
            y = (
                jnp.einsum("czgq,kq->czgk", a2g, N3, precision=_PREC)
                + jnp.einsum("czgq,kq->czgk", adx2g, D3, precision=_PREC)
            ).reshape(c, n1z, n1yp, n1x)
            if n1yp != n1y:
                y = y[:, :, :n1y]
        elif _bf163_stages(t.dtype):
            Ngx, Dgx = banded_tables(order, q_order, ne[0])
            NDxT3 = jnp.asarray(
                np.concatenate([_tstack(Ngx.T, 1), _tstack(Dgx.T, 1)], axis=1)
            )  # (n1x, 6Q)
            y = _ein3(
                "czyQ,xQ->czyx",
                jnp.concatenate([_xstack(a2, 3), _xstack(adx2, 3)], axis=3),
                NDxT3,
            )
        else:
            y = jnp.einsum("czyQ,xQ->czyx", a2, NxT, precision=_PREC) + jnp.einsum(
                "czyQ,xQ->czyx", adx2, DxT, precision=_PREC
            )
        return y if tensor_io else y.reshape(c, -1).T.reshape(x.shape)
    EQ = w_l.shape[0]
    v, ders = lattice_interp(t, tabs)
    # opt-in only: measured 1.188 (Pallas) vs 1.114 ms (XLA chains) per apply
    # at the p=6 flagship — XLA fuses the c-leading row-sliced FMA chains well
    # enough that the kernel's concat/pad/grid overhead is a net loss here
    # (unlike the dense path, where the pre-matmul layout already matches).
    qp_pallas = (
        A_const is not None
        and jax.default_backend() == "tpu"
        and os.environ.get("L3STER_TPU_LATTICE_PALLAS_QP", "0") in ("1", "true")
    )
    if qp_pallas:
        # fused per-QP chain: ~200 (EQ,)-wide FMA vectors stay in VMEM instead
        # of materializing in HBM (the XLA chain is the dominant traffic of
        # the whole operator at the p=6 flagship)
        from .pallas_qp import qp_algebra_const_pallas

        g = jnp.concatenate(
            [v.reshape(c, EQ)] + [d.reshape(c, EQ) for d in ders]
        )  # (d1*c, EQ), rows d*c+u — pure row concat, no transposes
        tt = qp_algebra_const_pallas(
            np.asarray(A_const), g, Ji_l.reshape(dim * dim, EQ), w_l, dim, c
        )
        t0s = tt[:c].reshape((c,) + qsh)
        tds = [tt[(1 + j) * c : (2 + j) * c].reshape((c,) + qsh) for j in range(dim)]
        y = lattice_transpose(t0s, tds, tabs)
        return y if tensor_io else y.reshape(c, -1).T.reshape(x.shape)
    vals_l = [v[u].reshape(EQ) for u in range(c)]
    rd = [[d[u].reshape(EQ) for u in range(c)] for d in ders]
    if A_const is not None:
        t0, tr = _qp_algebra_const(np.asarray(A_const), Ji_l, w_l, vals_l, rd, dim, c, x.dtype)
    elif var is not None:
        from ..algsys.local import _qp_algebra_nz

        nz_idx, A_nz, n_eq_v = var
        t0, tr = _qp_algebra_nz(
            nz_idx, A_nz, n_eq_v, Ji_l, w_l, vals_l, rd, dim, c
        )
    else:
        t0, tr = _qp_algebra_packed(A_t, Ji_l, w_l, vals_l, rd, dim, c)
    t0s = jnp.stack([ti.reshape(qsh) for ti in t0])
    tds = [jnp.stack([tj.reshape(qsh) for tj in tr[j]]) for j in range(dim)]
    y = lattice_transpose(t0s, tds, tabs)
    return y if tensor_io else y.reshape(c, -1).T.reshape(x.shape)
