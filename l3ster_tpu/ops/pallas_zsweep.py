"""Pallas TPU kernel: fused z-sweep + per-QP algebra + z-transpose.

The LATTICE_SF apply (``ops/lattice_sumfact.py``) spends most of its time
materializing the largest intermediates in HBM: the four (c, Sz, R, Q)
QP-space tensors of the z-interpolation, the per-QP least-squares chain, and
the z-transpose back.  This kernel fuses that whole middle section.

Mosaic-friendly formulation: the (R, Q) axes — pure batch axes for every op
in the section — are flattened into ONE lane axis padded to a multiple of the
block size, and the grid tiles it.  Every in-kernel array is 2D
(rows = lattice-z or QP-z, lanes = the RQ tile); channels are middle-dim
index slices of 3D refs, never reshaped (Mosaic cannot relayout multi-dim
shape casts).  Each grid step runs

    z-interp (4c MXU dots) -> J^-T / A / w / A^T / J^-1 (VPU) ->
    z-transpose (4c MXU dots)

entirely in VMEM and writes a distinct lane-tile of the three
pre-y-transpose tensors.  No cross-step state, no accumulation.

Constant-coefficient kernels only (A's scalars baked into the instruction
stream, zeros skipped — mirrors ``_qp_algebra_const``).
Reference for the math: ``algsys/SumFactorization.hpp`` +
``algsys/EvaluateLocalOperator.hpp`` (sum-factorized operator apply).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_z_sweep"]


def _make_kernel(A: np.ndarray, c: int):
    d1, n_eq = A.shape[0], A.shape[1]
    assert d1 == 4, "fused z-sweep is 3D-only"
    # Mosaic supports only DEFAULT/HIGHEST in-kernel; these contractions are
    # a small share of total FLOPs, so 6-pass HIGHEST is cheap and exact
    HI = jax.lax.Precision.HIGHEST

    def dot0(t, m):  # contract dim0 x dim0: (K, M), (K, N) -> (M, N)
        return jax.lax.dot_general(
            t, m, (((0,), (0,)), ((), ())), precision=HI,
            preferred_element_type=t.dtype,
        )

    def dot1(t, m):  # plain matmul: (M, K), (K, N) -> (M, N)
        return jax.lax.dot_general(
            t, m, (((1,), (0,)), ((), ())), precision=HI,
            preferred_element_type=t.dtype,
        )

    def kernel(b_ref, bdy_ref, bdx_ref, ji_ref, w_ref, nz_ref, dz_ref,
               a_ref, ady_ref, adx_ref):
        # Two phases, each looping channels so per-channel temporaries are
        # reclaimed: only the n_eq `rw` accumulators stay live across the
        # loop — this keeps the Mosaic scoped-VMEM stack ~(n_eq + O(1))·S·LB
        # instead of ~(8c + 2·d1·c)·S·LB, fitting the 16MB VMEM at any mesh
        # size the adaptive lane block allows.
        NzT = nz_ref[:]  # (n1z, S)
        DzT = dz_ref[:]
        w = w_ref[:]  # (S, LB)
        ji = [[ji_ref[j * 3 + i] for i in range(3)] for j in range(3)]  # (S, LB) each
        rw = [jnp.zeros_like(w) for _ in range(n_eq)]
        for u in range(c):
            bu = b_ref[:, u]
            v = dot0(NzT, bu)  # (S, LB)
            dz = dot0(DzT, bu)
            dy = dot0(NzT, bdy_ref[:, u])
            dx = dot0(NzT, bdx_ref[:, u])
            rd = (dx, dy, dz)  # reference-axis derivatives 0,1,2
            # physical derivatives: pders[i] = sum_j ji[j][i] * rd[j]
            pders = [sum(ji[j][i] * rd[j] for j in range(3)) for i in range(3)]
            gp_u = [v] + pders
            for i in range(n_eq):
                terms = [
                    float(A[d, i, u]) * gp_u[d] for d in range(d1) if A[d, i, u] != 0.0
                ]
                if terms:
                    rw[i] = rw[i] + sum(terms)
        rw = [r * w for r in rw]
        for u in range(c):

            def dotAT(d):
                terms = [
                    float(A[d, i, u]) * rw[i] for i in range(n_eq) if A[d, i, u] != 0.0
                ]
                return sum(terms) if terms else jnp.zeros_like(w)

            t = [dotAT(d) for d in range(d1)]
            # back to reference axes: tref[j] = sum_i ji[j][i] * t[1+i]
            tx = sum(ji[0][i] * t[1 + i] for i in range(3))
            ty = sum(ji[1][i] * t[1 + i] for i in range(3))
            tz = sum(ji[2][i] * t[1 + i] for i in range(3))
            a_ref[:, u] = dot1(NzT, t[0]) + dot1(DzT, tz)
            ady_ref[:, u] = dot1(NzT, ty)
            adx_ref[:, u] = dot1(NzT, tx)

    return kernel


def fused_z_sweep(
    A_const: np.ndarray,
    b: jnp.ndarray,  # (n1z, c, RQ) post-y-stage values, (R, Q) flattened
    bdy: jnp.ndarray,
    bdx: jnp.ndarray,
    ji: jnp.ndarray,  # (9, S, RQ) inverse Jacobians, rows j*3+i
    w: jnp.ndarray,  # (S, RQ) weights * measure
    NzT: jnp.ndarray,  # (n1z, S) banded z table
    DzT: jnp.ndarray,
    block: int = 768,
    interpret: bool = False,
):
    """Returns (a, ady, adx), each (n1z, c, RQ): the pre-y-transpose tensors."""
    from jax.experimental import pallas as pl

    A = np.asarray(A_const, np.float64)
    n1z, c, RQ = b.shape
    S = NzT.shape[1]
    # VMEM-adaptive lane block: the kernel's scoped stack scales ~ S * LB
    # (empirically ~42 f32 rows of S per lane at c=4); budget ~12MB of the
    # 16MB VMEM so Mosaic always fits (larger meshes have larger S = ne_z*q1)
    vmem_cap = max(128, (12_000_000 // (S * 168)) // 128 * 128)
    LB = max(128, (min(block, vmem_cap, RQ) // 128) * 128)
    n_blocks = -(-RQ // LB)
    RQp = n_blocks * LB

    def pad(x):
        if RQp == RQ:
            return x
        padw = [(0, 0)] * (x.ndim - 1) + [(0, RQp - RQ)]
        return jnp.pad(x, padw)

    kernel = _make_kernel(A, c)
    bl3 = pl.BlockSpec((n1z, c, LB), lambda r: (0, 0, r))
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n1z, c, RQp), b.dtype)] * 3,
        grid=(n_blocks,),
        in_specs=[
            bl3,
            bl3,
            bl3,
            pl.BlockSpec((9, S, LB), lambda r: (0, 0, r)),
            pl.BlockSpec((S, LB), lambda r: (0, r)),
            pl.BlockSpec((n1z, S), lambda r: (0, 0)),
            pl.BlockSpec((n1z, S), lambda r: (0, 0)),
        ],
        out_specs=[bl3] * 3,
        interpret=interpret,
    )(pad(b), pad(bdy), pad(bdx), pad(ji), pad(w), NzT, DzT)
    a, ady, adx = out
    if RQp != RQ:
        a, ady, adx = a[..., :RQ], ady[..., :RQ], adx[..., :RQ]
    return a, ady, adx
