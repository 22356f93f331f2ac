"""Native host-ops: C++ and numpy paths must agree."""

import numpy as np

from l3ster_tpu import native


def test_hash_join_matches_numpy():
    rng = np.random.default_rng(1)
    table = np.unique(rng.integers(0, 200, size=(5000, 3)), axis=0)
    perm = rng.permutation(len(table))
    query = np.concatenate([table[perm[:3000]], rng.integers(500, 600, size=(100, 3))])
    out = native.hash_join_rows(table, query)
    ref = native._np_join(native._prep(table), native._prep(query))
    assert np.array_equal(out, ref)
    assert np.array_equal(out[:3000], perm[:3000])
    assert (out[3000:] == -1).all()


def test_unique_rows_first_occurrence():
    rng = np.random.default_rng(2)
    rows = rng.integers(0, 20, size=(4000, 2))
    ui, inv = native.unique_rows(rows)
    assert np.array_equal(rows[ui][inv], rows)
    seen: set = set()
    expect = [i for i, r in enumerate(map(tuple, rows)) if r not in seen and not seen.add(r)]
    assert np.array_equal(ui, np.asarray(expect))


def test_join_single_column():
    table = np.asarray([5, 3, 9, 1])
    q = np.asarray([9, 2, 5])
    assert np.array_equal(native.hash_join_rows(table, q), [2, -1, 0])


def test_native_ilu0_parity():
    """C++ ILU0 must bit-match the numpy reference loop on a random CSR."""
    import scipy.sparse as sp

    import l3ster_tpu.native as native
    import l3ster_tpu.solve.tri as tri

    rng = np.random.default_rng(0)
    n = 300
    A = sp.random(n, n, density=0.04, random_state=2)
    A = (A + A.T + sp.eye(n) * 10).tocsr()
    A.sort_indices()
    nat = native.ilu0_factor_csr(A.data, A.indices, A.indptr, n)
    if nat is None:
        pytest.skip("native library unavailable")
    orig = native.ilu0_factor_csr
    native.ilu0_factor_csr = lambda *a: None
    try:
        ref = tri.ilu0_factor(A.data, A.indices, A.indptr, n)
    finally:
        native.ilu0_factor_csr = orig
    assert np.abs(nat - ref).max() == 0.0


def test_native_tri_levels_parity():
    """C++ tri_levels must match the python topological-level loop, both
    triangles, on a random sparsity."""
    import scipy.sparse as sp

    import l3ster_tpu.native as native
    import l3ster_tpu.solve.tri as tri

    n = 400
    A = sp.random(n, n, density=0.03, random_state=5)
    A = (A + A.T + sp.eye(n)).tocsr()
    A.sort_indices()
    for lower in (True, False):
        nat = native.tri_levels(A.indices, A.indptr, n, lower)
        if nat is None:
            import pytest

            pytest.skip("native library unavailable")
        orig = native.tri_levels
        native.tri_levels = lambda *a: None
        try:
            ref = tri._levels(n, A.indptr.astype(np.int64), A.indices.astype(np.int64), lower)
        finally:
            native.tri_levels = orig
        assert (nat == ref).all()
