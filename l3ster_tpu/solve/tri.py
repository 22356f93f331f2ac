"""Level-scheduled sparse triangular solves (traceable).

Support for the SGS / ILU(0) preconditioners
(``solve/Ifpack2Preconditioners.hpp:97,148``).  A sequential sparse
triangular solve is hostile to wide SIMD hardware; the TPU-native design is
*level scheduling*: a host-side topological analysis groups rows into levels
with no intra-level dependencies, and the traced solve is a
``lax.fori_loop`` over levels where each level is one batched
gather / segment-sum / scatter.  All index maps are static and travel as jit
arguments (operator_parts protocol).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["build_tri_solve", "build_tri_solve_stacked", "ilu0_factor"]


def _levels(n: int, indptr: np.ndarray, indices: np.ndarray, lower: bool) -> np.ndarray:
    """Topological level of each row for a (strictly) triangular solve.

    Native C++ single pass when available (O(nnz); the python row loop is
    the portability fallback -- it dominates preconditioner setup time at
    production sizes otherwise)."""
    from ..native import tri_levels

    native = tri_levels(indices, indptr, n, lower)
    if native is not None:
        return native
    level = np.zeros(n, dtype=np.int64)
    order = range(n) if lower else range(n - 1, -1, -1)
    for i in order:
        deps = indices[indptr[i] : indptr[i + 1]]
        deps = deps[deps < i] if lower else deps[deps > i]
        if len(deps):
            level[i] = level[deps].max() + 1
    return level


def _tri_consts_np(data, indices, indptr, n: int, lower: bool, unit_diag: bool):
    """Host-side level-schedule index maps for one triangular solve.

    Returns ``(ROWS, DINV, COLS, VALS, SEG, r_max, n_lv)`` numpy arrays with
    the padding conventions documented in :func:`build_tri_solve`.
    """
    data = np.asarray(data, dtype=np.float64)
    indices = np.asarray(indices, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)
    rows_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    tri_mask = (indices < rows_all) if lower else (indices > rows_all)
    tri_rows = rows_all[tri_mask]
    tri_cols = indices[tri_mask]
    tri_vals = data[tri_mask]

    if unit_diag:
        dinv = np.ones(n)
    else:
        dmask = indices == rows_all
        dvals = np.zeros(n)
        dvals[rows_all[dmask]] = data[dmask]
        if (dvals == 0).any():
            raise ValueError("triangular solve requires nonzero diagonal entries")
        dinv = 1.0 / dvals

    level = _levels(n, indptr, indices, lower)
    n_lv = int(level.max()) + 1 if n else 1
    # rows grouped by level, vectorized (sort + running offset per level)
    order_r = np.argsort(level, kind="stable")
    lv_of = level[order_r]
    starts_r = np.searchsorted(lv_of, np.arange(n_lv))
    slot_of = np.arange(n, dtype=np.int64) - starts_r[lv_of]
    r_max = max(1, int(np.bincount(lv_of, minlength=n_lv).max()) if n else 1)
    slot = np.zeros(n, dtype=np.int64)
    slot[order_r] = slot_of
    ROWS = np.full((n_lv, r_max), n, dtype=np.int64)  # pad -> dump slot
    DINV = np.ones((n_lv, r_max))
    ROWS[lv_of, slot_of] = order_r
    DINV[lv_of, slot_of] = dinv[order_r]

    ent_lv = level[tri_rows]
    counts = np.bincount(ent_lv, minlength=n_lv)
    n_max = max(1, int(counts.max()) if len(counts) else 1)
    COLS = np.full((n_lv, n_max), n, dtype=np.int64)  # pad -> x dump (0)
    VALS = np.zeros((n_lv, n_max))
    SEG = np.full((n_lv, n_max), r_max, dtype=np.int64)  # pad -> discard segment
    # entries sorted by level; the slot within a level is the running offset
    # from that level's first entry (vectorized: no python loop over nnz)
    order = np.argsort(ent_lv, kind="stable")
    lv_sorted = ent_lv[order]
    starts = np.searchsorted(lv_sorted, np.arange(n_lv))
    k_sorted = np.arange(len(order)) - starts[lv_sorted]
    COLS[lv_sorted, k_sorted] = tri_cols[order]
    VALS[lv_sorted, k_sorted] = tri_vals[order]
    SEG[lv_sorted, k_sorted] = slot[tri_rows[order]]
    return ROWS, DINV, COLS, VALS, SEG, r_max, n_lv


def build_tri_solve(data, indices, indptr, n: int, lower: bool, unit_diag: bool, dtype):
    """Build a traceable solver for T x = b, T = triangular part (+ diagonal)
    of the given CSR.

    Returns ``(apply, consts)`` with ``apply(b, *consts) -> x`` jit-safe;
    ``b`` is (n, n_rhs).
    """
    ROWS, DINV, COLS, VALS, SEG, r_max, n_lv = _tri_consts_np(
        data, indices, indptr, n, lower, unit_diag
    )
    consts = (
        jnp.asarray(ROWS, jnp.int32),
        jnp.asarray(DINV, dtype),
        jnp.asarray(COLS, jnp.int32),
        jnp.asarray(VALS, dtype),
        jnp.asarray(SEG, jnp.int32),
    )

    def apply(b, ROWS, DINV, COLS, VALS, SEG):
        n_rhs = b.shape[1]
        x = jnp.zeros((n + 1, n_rhs), b.dtype)
        bb = jnp.concatenate([b, jnp.zeros((1, n_rhs), b.dtype)])

        def body(lv, x):
            contrib = VALS[lv][:, None] * x[COLS[lv]]
            s = jax.ops.segment_sum(contrib, SEG[lv], num_segments=r_max + 1)[:r_max]
            xr = (bb[ROWS[lv]] - s) * DINV[lv][:, None]
            return x.at[ROWS[lv]].set(xr)

        x = jax.lax.fori_loop(0, n_lv, body, x)
        return x[:n]

    return apply, consts


def build_tri_solve_stacked(csrs, n: int, lower: bool, unit_diag: bool, dtype):
    """Shard-stacked level-scheduled triangular solves (additive Schwarz).

    ``csrs`` is a list of per-shard ``(data, indices, indptr)`` over a COMMON
    local size ``n``; the per-shard level schedules are padded to common
    shapes and stacked on a leading axis, so the traced program is identical
    across shards (only index values differ) — it runs per-device under a
    sharded ``vmap`` with no communication, the analog of Ifpack2's per-rank
    local solves (``solve/Ifpack2Preconditioners.hpp:85-192``).

    Returns ``(apply, consts)`` with ``apply(b, *consts) -> x`` for
    ``b`` (P, n, n_rhs).
    """
    parts = [
        _tri_consts_np(d, i, p, n, lower, unit_diag) for d, i, p in csrs
    ]
    NLV = max(pt[6] for pt in parts)
    RMAX = max(pt[5] for pt in parts)
    NMAX = max(pt[2].shape[1] for pt in parts)
    P = len(parts)
    ROWS = np.full((P, NLV, RMAX), n, dtype=np.int64)
    DINV = np.ones((P, NLV, RMAX))
    COLS = np.full((P, NLV, NMAX), n, dtype=np.int64)
    VALS = np.zeros((P, NLV, NMAX))
    SEG = np.full((P, NLV, NMAX), RMAX, dtype=np.int64)
    for p, (R_, D_, C_, V_, S_, rm, nl) in enumerate(parts):
        ROWS[p, :nl, :rm] = R_
        DINV[p, :nl, :rm] = D_
        COLS[p, :nl, : C_.shape[1]] = C_
        VALS[p, :nl, : C_.shape[1]] = V_
        SEG[p, :nl, : C_.shape[1]] = np.where(S_ == rm, RMAX, S_)
    consts = (
        jnp.asarray(ROWS, jnp.int32),
        jnp.asarray(DINV, dtype),
        jnp.asarray(COLS, jnp.int32),
        jnp.asarray(VALS, dtype),
        jnp.asarray(SEG, jnp.int32),
    )

    def single(b, ROWS, DINV, COLS, VALS, SEG):
        # carry/padding derived from b (not fresh zeros) so the traced values
        # stay "varying" under shard_map's manual-axes check
        bb = jnp.pad(b, ((0, 1), (0, 0)))
        x = bb * 0

        def body(lv, x):
            contrib = VALS[lv][:, None] * x[COLS[lv]]
            s = jax.ops.segment_sum(contrib, SEG[lv], num_segments=RMAX + 1)[:RMAX]
            xr = (bb[ROWS[lv]] - s) * DINV[lv][:, None]
            return x.at[ROWS[lv]].set(xr)

        x = jax.lax.fori_loop(0, NLV, body, x)
        return x[:n]

    def apply(b, ROWS, DINV, COLS, VALS, SEG):
        return jax.vmap(single)(b, ROWS, DINV, COLS, VALS, SEG)

    return apply, consts


def ilu0_factor(data, indices, indptr, n: int):
    """Zero-fill incomplete LU on the CSR's own sparsity (RILUK level 0,
    ``solve/Ifpack2Preconditioners.hpp:148``).  Host-side numpy; columns
    within each row must be sorted (true for our sparsity builders).

    Returns the factored value array: strictly-lower entries hold L (unit
    diagonal implied), diagonal + upper hold U.  Uses the native C++
    factorization when available (the python row loop is O(nnz_lower) python
    iterations — slow at production sizes).
    """
    from ..native import ilu0_factor_csr

    native = ilu0_factor_csr(data, indices, indptr, n)
    if native is not None:
        return native
    a = np.array(data, dtype=np.float64, copy=True)
    indices = np.asarray(indices, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)
    diag_pos = np.empty(n, dtype=np.int64)
    for i in range(n):
        s, e = indptr[i], indptr[i + 1]
        dp = s + np.searchsorted(indices[s:e], i)
        if dp >= e or indices[dp] != i:
            raise ValueError("ILU0 requires explicit diagonal entries")
        diag_pos[i] = dp
    for i in range(n):
        s, e = indptr[i], indptr[i + 1]
        cols_i = indices[s:e]
        for kk in range(s, diag_pos[i]):
            k = indices[kk]
            akk = a[diag_pos[k]]
            if akk == 0.0:
                raise ZeroDivisionError(f"ILU0 breakdown: zero pivot at row {k}")
            lik = a[kk] / akk
            a[kk] = lik
            ks, ke = diag_pos[k] + 1, indptr[k + 1]
            if ks >= ke:
                continue
            ck = indices[ks:ke]
            pos = np.searchsorted(cols_i, ck)
            posc = np.minimum(pos, len(cols_i) - 1)
            hit = (pos < len(cols_i)) & (cols_i[posc] == ck)
            a[s + pos[hit]] -= lik * a[ks:ke][hit]
    return a
