"""Pallas TPU kernel v2: fused z-sweep with lane-packed channels.

Redesign of :mod:`pallas_zsweep` driven by measurement: the v1 kernel is
MXU-pass bound — 32 small per-channel dots per grid step, each padding
K=n1z(37)->128 and M=S(42)->128 (~10% tile utilization), at 6-pass HIGHEST
precision.  v2 cuts the pass count ~2.5x:

1. **Channels live in the LANE axis** (tile layout ``(rows, c*LB)``, lanes
   ordered tile-major/channel-major by an outside-jit relayout).  The z
   contractions become ONE dot per tensor with N = c*LB — 4x fewer Mosaic
   ops at identical total N-tiles, and the per-QP algebra addresses channels
   as 128-aligned static lane slices.
2. **Manual bf16x3 ("HIGH") dots**: the z tables are pre-split into (hi, lo)
   bfloat16 parts on the host; in-kernel each dot runs as three DEFAULT
   (single-pass bf16) MXU passes ``Th@Xh + Th@Xl + Tl@Xh`` instead of
   HIGHEST's six — the same accuracy class (bf16x3) as the XLA x/y stages.
3. **Factorized diagonal geometry**: for axis-aligned box meshes (every
   generated Cube mesh) the inverse Jacobian is diagonal and separable per
   axis, so the geometry inputs shrink from (9, S, RQ) + (S, RQ) [~3MB] to
   five per-axis vectors and the J^-T / J^-1 transforms become 6 broadcast
   multiplies instead of 30 full-tile FMAs.

Sublane/lane alignment rules observed: the value/derivative row split uses
an 8-aligned padded offset Sp; channel lane slices are LB (multiple of 128)
aligned; no in-kernel multi-dim reshapes.

Reference for the math: ``algsys/SumFactorization.hpp`` +
``algsys/EvaluateLocalOperator.hpp`` (sum-factorized LSFEM operator apply).
f64 (test) mode uses exact HIGHEST dots and no splitting, so interpret-mode
parity against the XLA chain stays at 1e-12.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_z_sweep_v2", "detect_diag_geometry"]


def detect_diag_geometry(Ji_l, w_l, S: int, tol: float = 1e-11):
    """Host-side check: is the packed geometry axis-aligned and separable?

    Ji_l (3, 3, EQ) and w_l (EQ,) in interleaved QP order (z-major:
    EQ = S * RQ).  Returns ("diag", jx (1,RQ), jy (1,RQ), jz (S,1),
    wyx (1,RQ), wz (S,1)) or None.  jx varies only along the lane (RQ) axis,
    jz only along S; w must factor as wz ⊗ wyx.
    """
    Ji = np.asarray(Ji_l)
    w = np.asarray(w_l)
    EQ = w.shape[0]
    if EQ % S:
        return None
    RQ = EQ // S
    J = Ji.reshape(3, 3, S, RQ)
    scale = np.abs(J).max() + 1e-300
    off = max(np.abs(J[i, j]).max() for i in range(3) for j in range(3) if i != j)
    if off > tol * scale:
        return None
    jxm, jym, jzm = J[0, 0], J[1, 1], J[2, 2]
    if np.abs(jxm - jxm[:1]).max() > tol * scale:
        return None
    if np.abs(jym - jym[:1]).max() > tol * scale:
        return None
    if np.abs(jzm - jzm[:, :1]).max() > tol * scale:
        return None
    wm = w.reshape(S, RQ)
    wz = wm[:, :1].copy()
    if np.abs(wz).min() <= 0:
        return None
    wyx = (wm[:1] / wz[0]).copy()
    if np.abs(wm - wz * wyx).max() > tol * np.abs(wm).max():
        return None
    return ("diag", jxm[:1].copy(), jym[:1].copy(), jzm[:, :1].copy(), wyx, wz)


def _split_stack(T: np.ndarray, split: bool, dtype):
    """Table operand for the K-STACKED bf16x3 dot.

    split mode returns ``[Th; Th; Tl]`` (3K, M) bfloat16: the three MXU
    passes of the manual bf16x3 scheme (Th@Xh + Th@Xl + Tl@Xh) collapse into
    ONE dot against the in-kernel stacked input ``[Xh; Xl; Xh]`` (3K, N).
    At the p=6 flagship K=n1z=37 pads to 128 at 29% utilization; 3K=111
    fills 87% of one K tile, cutting the Mosaic dot count 3x at equal math.
    Non-split (f64/interpret) mode returns the exact table unchanged.
    """
    if not split:
        return jnp.asarray(T, dtype)
    hi = np.asarray(T, np.float32)
    hi_b = hi.astype(jnp.bfloat16)
    lo_b = (hi - np.asarray(hi_b, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(np.concatenate([hi_b, hi_b, lo_b], axis=0))


def _make_kernel(
    A: np.ndarray | None, c: int, diag: bool, split: bool, LB: int, S: int, Sp: int,
    var_spec: tuple | None = None,  # (nz_idx, n_eq): streamed variable A
    cz: bool = False,  # I/O blocks are (c, n1z, LB): slice channels in-kernel
):
    if var_spec is not None:
        nz_idx, n_eq = var_spec
        d1 = 4
    else:
        d1, n_eq = A.shape[0], A.shape[1]
    assert d1 == 4, "fused z-sweep is 3D-only"
    HI = jax.lax.Precision.HIGHEST

    def dot0(t, m, prefer):  # contract dim0 x dim0: (K, M), (K, N) -> (M, N)
        # split mode: operands are ALREADY bf16 (hi/lo pairs of the manual
        # bf16x3 scheme) — the dot must be an explicit single-pass DEFAULT;
        # inheriting jax_default_matmul_precision=highest would ask Mosaic
        # for an fp32-precision matmul on bf16 inputs (compile error)
        return jax.lax.dot_general(
            t, m, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT if split else HI,
            preferred_element_type=prefer,
        )

    def xsplit(x):
        """Pre-stacked bf16x3 input: [Xh; Xl; Xh] along K (split mode)."""
        if not split:
            return x
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([xh, xl, xh], axis=0)

    def dotT(t3, xs, dt):
        """One K-stacked dot: [Th;Th;Tl] @ [Xh;Xl;Xh] == bf16x3 in 1 pass."""
        return dot0(t3, xs, jnp.float32 if split else dt)

    def kernel(*refs):
        av_ref = None
        if diag:
            (b_ref, bdy_ref, bdx_ref, jx_ref, jy_ref, jz_ref, wz_ref,
             *rest) = refs
        else:
            (b_ref, bdy_ref, bdx_ref, ji_ref, w_ref, *rest) = refs
        if var_spec is not None:
            av_ref, *rest = rest
        (tnd3, gn3, gnd3, a_ref, ady_ref, adx_ref) = rest
        dt = jnp.float32 if split else b_ref.dtype
        CL = c * LB  # c * LB lanes

        def lane_rep(x):  # (r, LB) -> (r, c*LB)
            return x if c == 1 else jnp.concatenate([x] * c, axis=1)

        def read_io(ref):  # -> (n1z, c*LB) channel-major lanes
            if not cz:
                return ref[:]
            # (c, n1z, LB) natural-layout block: channel concat is a VMEM
            # shuffle; the HBM-side pad+moveaxis relayout copies are gone
            return (
                ref[0]
                if c == 1
                else jnp.concatenate([ref[u] for u in range(c)], axis=1)
            )

        def write_io(ref, val):  # val (rows, c*LB)
            if not cz:
                ref[:] = val
                return
            for u in range(c):
                ref[u] = val[:, u * LB : (u + 1) * LB]

        # ---- z interpolation: channels ride the lane axis
        bs = xsplit(read_io(b_ref))
        vdz = dotT(tnd3[:], bs, dt)  # (2Sp, c*LB): rows [0:S]=v, [Sp:Sp+S]=dz
        v = vdz[:S]
        dz = vdz[Sp : Sp + S]
        # dy/dx share the N-table: one dot at doubled N (same MXU cycles,
        # half the Mosaic op count / pipeline bubbles)
        bdyx = jnp.concatenate([read_io(bdy_ref), read_io(bdx_ref)], axis=1)
        dydx = dotT(tnd3[:, :Sp], xsplit(bdyx), dt)
        dy = dydx[:S, :CL]
        dx = dydx[:S, CL:]
        # ---- physical derivatives + weights
        if diag:
            jxr = lane_rep(jx_ref[:])  # (1, c*LB); sublane broadcast is cheap
            jyr = lane_rep(jy_ref[:])
            jz = lane_rep(jz_ref[:])  # (S, c*LB) pre-tiled (lane broadcast from
            # a (S, 1) vector was measured SLOWER than the full-ji kernel)
            px = jxr * dx
            py = jyr * dy
            pz = jz * dz
            wtile = wz_ref[:]  # (S, LB) pre-tiled full weight
        else:
            jir = [lane_rep(ji_ref[k]) for k in range(9)]
            rd = (dx, dy, dz)
            px = sum(jir[j * 3 + 0] * rd[j] for j in range(3))
            py = sum(jir[j * 3 + 1] * rd[j] for j in range(3))
            pz = sum(jir[j * 3 + 2] * rd[j] for j in range(3))
            wtile = w_ref[:]  # (S, LB)
        gp = (v, px, py, pz)
        # ---- r_i = (sum_{d,u} A[d,i,u] g_d,u) * w   on the (S, LB) tile
        rw = []
        if var_spec is not None:
            # variable A: nonzero (d,i,u) planes streamed per tile (av_ref)
            for i in range(n_eq):
                terms = [
                    av_ref[k] * gp[d][:, u * LB : (u + 1) * LB]
                    for k, (d, ii, u) in enumerate(nz_idx)
                    if ii == i
                ]
                rw.append((sum(terms) * wtile) if terms else None)
        else:
            for i in range(n_eq):
                terms = []
                for u in range(c):
                    sl = slice(u * LB, (u + 1) * LB)
                    for d in range(d1):
                        if A[d, i, u] != 0.0:
                            terms.append(float(A[d, i, u]) * gp[d][:, sl])
                rw.append((sum(terms) * wtile) if terms else None)
        # ---- t_d,u = sum_i A[d,i,u] r_i, channels back into lane blocks
        zero = None

        def tblock(d, u):
            nonlocal zero
            if var_spec is not None:
                terms = [
                    av_ref[k] * rw[i]
                    for k, (dd, i, uu) in enumerate(nz_idx)
                    if dd == d and uu == u and rw[i] is not None
                ]
            else:
                terms = [
                    float(A[d, i, u]) * rw[i]
                    for i in range(n_eq)
                    if A[d, i, u] != 0.0 and rw[i] is not None
                ]
            if terms:
                return sum(terms)
            if zero is None:
                zero = wtile * 0.0
            return zero

        tvec = [
            jnp.concatenate([tblock(d, u) for u in range(c)], axis=1) for d in range(d1)
        ]
        # ---- back to reference axes
        if diag:
            tx = jxr * tvec[1]
            ty = jyr * tvec[2]
            tz = jz * tvec[3]
        else:
            tx = sum(jir[0 * 3 + i] * tvec[1 + i] for i in range(3))
            ty = sum(jir[1 * 3 + i] * tvec[1 + i] for i in range(3))
            tz = sum(jir[2 * 3 + i] * tvec[1 + i] for i in range(3))
        # ---- z transpose
        # a = Nz^T t0 + Dz^T tz as ONE dot with stacked contraction dim
        # (K = 2S: halves the K-padding waste of two K=S dots); ty/tx share
        # Nz^T at doubled N
        t0z = jnp.concatenate([tvec[0], tz], axis=0)  # (2S, c*LB)
        write_io(a_ref, dotT(gnd3[:], xsplit(t0z), dt))
        tyx = jnp.concatenate([ty, tx], axis=1)  # (S, 2*c*LB)
        oyx = dotT(gn3[:], xsplit(tyx), dt)
        write_io(ady_ref, oyx[:, :CL])
        write_io(adx_ref, oyx[:, CL:])

    return kernel


def fused_z_sweep_v2(
    A_const: np.ndarray | None,
    b: jnp.ndarray,  # (n1z, c, RQ) post-y-stage values; (c, n1z, RQ) with layout="cz"
    bdy: jnp.ndarray,
    bdx: jnp.ndarray,
    geom: tuple,  # ("full", ji (9,S,RQ), w (S,RQ)) or ("diag", jx, jy, jz, wyx, wz)
    NzT: jnp.ndarray,  # (n1z, S) banded z table
    DzT: jnp.ndarray,
    block: int = 512,
    interpret: bool = False,
    host_tables: tuple | None = None,  # numpy (NzT, DzT) when NzT/DzT are traced
    var: tuple | None = None,  # (nz_idx, A_var (K, S, RQ), n_eq) variable A
    layout: str = "zc",
):
    """Returns (a, ady, adx) pre-y-transpose tensors in the input layout.

    ``layout="cz"`` takes/returns the NATURAL (c, n1z, RQ) einsum layout:
    blocks are (c, n1z, LB) and channels are lane-concatenated in VMEM, so
    the surrounding XLA graph needs no pad+moveaxis relayout copies (~19MB
    of HBM traffic at the p=6 flagship) and the y-stage einsums keep their
    batch order (no transpose-on-write)."""
    from jax.experimental import pallas as pl

    import os

    A = None if A_const is None else np.asarray(A_const, np.float64)
    block = int(os.environ.get("L3STER_TPU_ZSWEEP_BLOCK", block))
    cz = layout == "cz"
    if cz:
        c, n1z, RQ = b.shape
    else:
        n1z, c, RQ = b.shape
    S = NzT.shape[1]
    Sp = -(-S // 8) * 8
    diag = geom[0] == "diag"
    split = (b.dtype == jnp.float32) and not interpret
    itemsize = np.dtype(b.dtype).itemsize
    K_var = 0 if var is None else int(var[1].shape[0])
    # ~20 live (S, c*LB)-sized arrays in the algebra section (+K var planes)
    per_lane = max(1, (20 * c + K_var) * S * itemsize)
    vmem_cap = max(128, (10_000_000 // per_lane) // 128 * 128)
    # (13MB cap -> LB=512 was tried: slower, 0.354 vs ~0.31 ms -- the larger
    # block pads RQ 8.6% vs 3.7% and wins nothing on grid overhead)
    LB = max(128, (min(block, vmem_cap, RQ) // 128) * 128)
    n_blocks = -(-RQ // LB)
    RQp = n_blocks * LB

    if cz:

        def to_lanes(x):  # (c, n1z, RQ): pad only, blocks slice the lane axis
            return (
                jnp.pad(x, ((0, 0), (0, 0), (0, RQp - RQ))) if RQp != RQ else x
            )

        def from_lanes(x):
            return x[..., :RQ] if RQp != RQ else x

    else:

        def to_lanes(x):
            # (n1z, c, RQ) -> (n1z, n_blocks * c * LB): lanes tile-major then
            # channel-major, so each grid block sees channel-major (c, LB) lanes
            if RQp != RQ:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, RQp - RQ)))
            x = x.reshape(n1z, c, n_blocks, LB)
            return jnp.moveaxis(x, 2, 1).reshape(n1z, n_blocks * c * LB)

        def from_lanes(x):
            x = x.reshape(n1z, n_blocks, c, LB)
            x = jnp.moveaxis(x, 1, 2).reshape(n1z, c, RQp)
            return x[..., :RQ] if RQp != RQ else x

    if host_tables is not None:
        npN = np.asarray(host_tables[0], np.float64)
        npD = np.asarray(host_tables[1], np.float64)
    else:  # requires concrete (non-traced) table arrays
        npN = np.asarray(NzT, np.float64)
        npD = np.asarray(DzT, np.float64)
    TND = np.zeros((n1z, 2 * Sp))  # cols [0:S] = NzT, [Sp:Sp+S] = DzT
    TND[:, :S] = npN
    TND[:, Sp : Sp + S] = npD
    tnd3 = _split_stack(TND, split, b.dtype)
    gn3 = _split_stack(npN.T, split, b.dtype)  # (S, n1z)
    # stacked [N; D] z-transpose table: a = [N;D]^T [t0; tz] in one dot
    gnd3 = _split_stack(np.concatenate([npN.T, npD.T], axis=0), split, b.dtype)
    ks = 3 if split else 1  # K-stack factor of the bf16x3 tables

    kernel = _make_kernel(
        A, c, diag, split, LB, S, Sp,
        var_spec=None if var is None else (var[0], var[2]),
        cz=cz,
    )
    if cz:
        bl = pl.BlockSpec((c, n1z, LB), lambda r: (0, 0, r))
    else:
        bl = pl.BlockSpec((n1z, c * LB), lambda r: (0, r))
    in_specs = [bl, bl, bl]
    args = [to_lanes(b), to_lanes(bdy), to_lanes(bdx)]
    if diag:
        _, jx, jy, jz, wyx, wz = geom

        def pad_lane(v):
            return jnp.pad(v, ((0, 0), (0, RQp - RQ))) if RQp != RQ else v

        # jz and w go in pre-tiled to (S, RQp): in-kernel lane broadcast from
        # a single lane is slow on Mosaic (measured slower than full-ji)
        jz_t = pad_lane(jnp.broadcast_to(jnp.asarray(jz, b.dtype), (S, RQ)))
        w_t = pad_lane(jnp.asarray(wz, b.dtype) * jnp.asarray(wyx, b.dtype))
        args += [pad_lane(jnp.asarray(jx, b.dtype)), pad_lane(jnp.asarray(jy, b.dtype)), jz_t, w_t]
        in_specs += [
            pl.BlockSpec((1, LB), lambda r: (0, r)),
            pl.BlockSpec((1, LB), lambda r: (0, r)),
            pl.BlockSpec((S, LB), lambda r: (0, r)),
            pl.BlockSpec((S, LB), lambda r: (0, r)),
        ]
    else:
        _, ji, w = geom
        if RQp != RQ:
            ji = jnp.pad(ji, ((0, 0), (0, 0), (0, RQp - RQ)))
            w = jnp.pad(w, ((0, 0), (0, RQp - RQ)))
        args += [ji, w]
        in_specs += [
            pl.BlockSpec((9, S, LB), lambda r: (0, 0, r)),
            pl.BlockSpec((S, LB), lambda r: (0, r)),
        ]
    if var is not None:
        A_var = var[1]
        if RQp != RQ:
            A_var = jnp.pad(A_var, ((0, 0), (0, 0), (0, RQp - RQ)))
        args += [A_var]
        in_specs += [pl.BlockSpec((K_var, S, LB), lambda r: (0, 0, r))]
    args += [tnd3, gn3, gnd3]
    in_specs += [
        pl.BlockSpec((ks * n1z, 2 * Sp), lambda r: (0, 0)),
        pl.BlockSpec((ks * S, n1z), lambda r: (0, 0)),
        pl.BlockSpec((ks * 2 * S, n1z), lambda r: (0, 0)),
    ]
    out_sh = (c, n1z, RQp) if cz else (n1z, n_blocks * c * LB)
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(out_sh, b.dtype)] * 3,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[bl] * 3,
        interpret=interpret,
    )(*args)
    return tuple(from_lanes(o) for o in out)
