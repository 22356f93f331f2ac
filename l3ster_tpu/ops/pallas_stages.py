"""Pallas x/y sweep-stage kernels: all bf16x3 operand packing in VMEM.

Round-4 measurement (BENCH_SWEEP.md): K-stacked manual bf16x3 — table
``[Th; Th; Tl]`` against input ``[Xh; Xl; Xh]``, one DEFAULT MXU pass
instead of HIGH's three — WINS inside the Pallas z-sweep kernel (operands
in VMEM) but LOSES as XLA einsums, where the conversions and K-concats
materialize in HBM.  The surviving conclusion: packing must happen in VMEM.

This module applies that conclusion to the remaining XLA sweep stages of the
lattice apply (``ops/lattice_sumfact.local_apply_lattice``): each banded
x/y interpolation / transposition matmul becomes a Pallas kernel that

1. splits its f32 input into (hi, lo) bfloat16 parts IN VMEM,
2. K-stacks them against a host-prestacked bf16 table, and
3. runs ONE single-pass MXU dot per M-tile — at the p=6 flagship the
   banded tables have K = n1 = 37, so 3K = 111 fills 87% of the 128-wide
   K tile vs 29% x 3 passes for a HIGH einsum;

and pairs the N/D tables along the free dim (``[N | D]``, N=84) so the
value/derivative sweeps of one stage share a single dot.

The f64 / CPU (interpret) path runs exact HIGHEST dots with no splitting,
preserving the 1e-12 oracle parity of the test suite.

**Measured outcome (2026-08-21, kept as an opt-in experiment — the default
pipeline stays XLA):** each stage kernel is ~6x faster than its XLA einsum
pair in ISOLATION (3.5 us for the flagship x-stage incl. launch overhead),
but the composed pipeline measures 0.274 ms/apply vs 0.145 ms for the XLA
stages (``benchmarks/probe_newpath.py``): the 7 custom-call boundaries force
every inter-stage relayout to materialize in HBM and serialize scheduling,
costing more than the MXU-pass savings.  The conclusion that survives both
rounds of measurement: on TPU, operand packing pays only when the ENTIRE
producer-consumer chain shares one kernel's VMEM — partial kernelization of
a fused-by-XLA pipeline is a net loss.

Reference for the math: ``algsys/SumFactorization.hpp`` (the reference's own
restructure-the-sweeps-for-hardware precedent).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kstacked_matmul", "stage_tables"]


def _tstack3(T: np.ndarray) -> np.ndarray:
    """Host-side K-stacked bf16x3 table: [Th; Th; Tl] along the K axis."""
    import ml_dtypes

    hi = np.asarray(T, np.float32)
    hib = hi.astype(ml_dtypes.bfloat16)
    lob = (hi - hib.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.concatenate([hib, hib, lob], axis=0)


@lru_cache(maxsize=None)
def stage_tables(order: int, q_order: int, ne_a: int, kind: str, split: bool):
    """Device table for one sweep stage of axis size ``ne_a``.

    kind: "ND"  -> [N | D] paired interp table, (K=n1, 2*Qa)
          "N"   -> N only, (n1, Qa)
          "NDT" -> transpose-pair table [[N'], [D']], (2*Qa, n1) — consumed
                   with the K-concat input [a | ad]
          "NT"  -> N' only, (Qa, n1)
    ``split`` returns the bf16x3 K-stacked form (3K, N).
    """
    from .lattice_sumfact import banded_tables

    Ng, Dg = banded_tables(order, q_order, ne_a)  # (Qa, n1)
    if kind == "ND":
        T = np.concatenate([Ng.T, Dg.T], axis=1)  # (n1, 2Qa)
    elif kind == "N":
        T = Ng.T
    elif kind == "NDT":
        T = np.concatenate([Ng, Dg], axis=0)  # (2Qa, n1)
    elif kind == "NT":
        T = Ng
    else:  # pragma: no cover
        raise ValueError(kind)
    return jnp.asarray(_tstack3(T)) if split else jnp.asarray(T, np.float64)


def _pick_mb(M: int, K: int, N: int, itemsize: int) -> int:
    """Rows per grid block: bounded by a ~6 MB VMEM budget across the f32
    input block (lane-padded to 128), its 3K bf16 stack, and the f32 out."""
    lanes_in = -(-max(K, 1) // 128) * 128
    lanes_st = -(-3 * max(K, 1) // 128) * 128
    lanes_out = -(-max(N, 1) // 128) * 128
    per_row = 4 * lanes_in + 2 * lanes_st + 4 * lanes_out
    mb = (6_000_000 // max(per_row, 1)) // 8 * 8
    return int(max(8, min(mb, -(-M // 8) * 8, 4096)))


def kstacked_matmul(
    x: jnp.ndarray,  # (M, K) f32 (or f64 in interpret mode)
    x2: jnp.ndarray | None,  # optional (M, K2): K-concat pair [x | x2]
    T3: jnp.ndarray,  # stage_tables(...) result — (3*(K[+K2]), N) bf16 or exact
    N: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x[|x2] @ T`` with bf16x3 splitting + K-stacking done in VMEM.

    The K-concat pair form computes ``x @ T_a + x2 @ T_b`` (one dot, K=K1+K2)
    for the transpose stages' value+derivative sums.  Returns (M, N) f32.
    """
    from jax.experimental import pallas as pl

    M, K = x.shape
    split = x.dtype == jnp.float32 and not interpret
    MB = _pick_mb(M, K + (0 if x2 is None else x2.shape[1]), N, x.dtype.itemsize)
    n_blocks = -(-M // MB)
    Mp = n_blocks * MB
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        if x2 is not None:
            x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    def split3(v):
        # convert-based split is SAFE inside Mosaic (no XLA excess-precision
        # elision of the f32->bf16->f32 round-trip; see lattice_sumfact._xstack
        # for the XLA-side hazard this kernel exists to avoid)
        vh = v.astype(jnp.bfloat16)
        vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        return vh, vl

    def kernel(*refs):
        if x2 is None:
            xr, tr, outr = refs
        else:
            xr, x2r, tr, outr = refs
        if not split:
            a = xr[:] if x2 is None else jnp.concatenate([xr[:], x2r[:]], axis=1)
            outr[:] = jax.lax.dot_general(
                a, tr[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=a.dtype,
            )
            return
        xh, xl = split3(xr[:])
        if x2 is None:
            a3 = jnp.concatenate([xh, xl, xh], axis=1)
        else:
            # K-concat pair: table is [T1h;T1h;T1l;T2h;T2h;T2l]
            yh, yl = split3(x2r[:])
            a3 = jnp.concatenate([xh, xl, xh, yh, yl, yh], axis=1)
        outr[:] = jax.lax.dot_general(
            a3, tr[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    K2 = 0 if x2 is None else x2.shape[1]
    KT = T3.shape[0]
    in_specs = [pl.BlockSpec((MB, K), lambda r: (r, 0))]
    args = [x]
    if x2 is not None:
        in_specs.append(pl.BlockSpec((MB, K2), lambda r: (r, 0)))
        args.append(x2)
    in_specs.append(pl.BlockSpec((KT, N), lambda r: (0, 0)))
    args.append(T3)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype if not split else jnp.float32),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((MB, N), lambda r: (r, 0)),
        interpret=interpret,
    )(*args)
    return out[:M] if Mp != M else out


def _kc_tables(order: int, q_order: int, ne_a: int, split: bool):
    """K-concat transpose-pair table for ``a @ N' + ad @ D'``: the two
    3-stacked halves concatenated along K (matching [ah;al;ah;adh;adl;adh])."""
    from .lattice_sumfact import banded_tables

    Ng, Dg = banded_tables(order, q_order, ne_a)  # (Qa, n1)
    if split:
        return jnp.asarray(np.concatenate([_tstack3(Ng), _tstack3(Dg)], axis=0))
    return jnp.asarray(np.concatenate([Ng, Dg], axis=0), np.float64)


kc_transpose_tables = lru_cache(maxsize=None)(_kc_tables)
