// Native host-side primitives for the mesh/DOF pipeline.
//
// The TPU compute path is XLA; this module covers the host-side runtime work
// the reference does in native C++ (mesh ingest, connectivity dedup, graph
// construction -- cf. mesh/ConvertMeshToOrder.hpp, algsys/SparsityGraph.hpp,
// mesh/MeshPartition.hpp boundary resolution).  Exposed as a plain C ABI and
// loaded through ctypes; everything has a vectorized numpy fallback, so the
// library works without compilation.
//
// All row keys are little arrays of int64; hashing is FNV-1a over the bytes.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint64_t hash_row(const int64_t* row, int k) {
    uint64_t h = 1469598103934665603ull;
    const unsigned char* p = reinterpret_cast<const unsigned char*>(row);
    for (int i = 0; i != k * 8; ++i) {
        h ^= p[i];
        h *= 1099511628211ull;
    }
    return h;
}

// Open-addressing hash table of row indices into an external row array.
struct RowTable {
    const int64_t* rows;
    int k;
    std::vector<int64_t> slots;  // row index + 1; 0 = empty
    uint64_t mask;

    RowTable(const int64_t* rows_, int64_t n, int k_) : rows(rows_), k(k_) {
        uint64_t cap = 16;
        while (cap < static_cast<uint64_t>(n) * 2) cap <<= 1;
        slots.assign(cap, 0);
        mask = cap - 1;
        for (int64_t i = 0; i != n; ++i) insert(i);
    }

    bool equal(int64_t a, const int64_t* q) const {
        return std::memcmp(rows + a * k, q, k * 8) == 0;
    }

    void insert(int64_t i) {
        uint64_t h = hash_row(rows + i * k, k) & mask;
        while (slots[h]) {
            if (equal(slots[h] - 1, rows + i * k)) return;  // keep first
            h = (h + 1) & mask;
        }
        slots[h] = i + 1;
    }

    int64_t find(const int64_t* q) const {
        uint64_t h = hash_row(q, k) & mask;
        while (slots[h]) {
            if (equal(slots[h] - 1, q)) return slots[h] - 1;
            h = (h + 1) & mask;
        }
        return -1;
    }
};

}  // namespace

extern "C" {

// For each query row, the index of the first equal row in `table`, or -1.
void hash_join_rows(const int64_t* table, int64_t n_table, const int64_t* query,
                    int64_t n_query, int k, int64_t* out) {
    RowTable t(table, n_table, k);
    int n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads < 1) n_threads = 1;
    if (n_query < 4096) n_threads = 1;
    std::vector<std::thread> workers;
    int64_t chunk = (n_query + n_threads - 1) / n_threads;
    for (int w = 0; w != n_threads; ++w) {
        int64_t lo = w * chunk;
        int64_t hi = lo + chunk < n_query ? lo + chunk : n_query;
        if (lo >= hi) break;
        workers.emplace_back([&, lo, hi] {
            for (int64_t i = lo; i != hi; ++i) out[i] = t.find(query + i * k);
        });
    }
    for (auto& w : workers) w.join();
}

// Deduplicate rows: writes the unique rows' first-occurrence indices to
// `uniq_idx` (caller-allocated, size n) and each row's unique-id to `inverse`
// (size n).  Returns the number of unique rows.  First-occurrence order.
int64_t unique_rows(const int64_t* rows, int64_t n, int k, int64_t* uniq_idx,
                    int64_t* inverse) {
    RowTable t(rows, n, k);  // keeps first occurrence of each row
    int64_t n_unique = 0;
    std::vector<int64_t> id_of(n, -1);
    for (int64_t i = 0; i != n; ++i) {
        int64_t first = t.find(rows + i * k);
        if (first == i) {
            uniq_idx[n_unique] = i;
            id_of[i] = n_unique;
            ++n_unique;
        }
        inverse[i] = id_of[first];
    }
    return n_unique;
}

// Zero-fill incomplete LU on a CSR's own sparsity (RILUK level 0,
// cf. solve/Ifpack2Preconditioners.hpp:148).  Column indices must be sorted
// within each row and the diagonal entries must be present.  Factorizes
// in-place in `data`: strictly-lower entries hold L (unit diagonal implied),
// diagonal + upper hold U.  Returns 0 on success, -(row+1) on a zero pivot,
// int64 min on a missing diagonal.
int64_t ilu0_factor_csr(double* data, const int64_t* indices, const int64_t* indptr,
                        int64_t n) {
    std::vector<int64_t> diag_pos(n);
    for (int64_t i = 0; i != n; ++i) {
        int64_t s = indptr[i], e = indptr[i + 1], d = -1;
        // binary search for the diagonal
        int64_t lo = s, hi = e;
        while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            if (indices[mid] < i)
                lo = mid + 1;
            else
                hi = mid;
        }
        if (lo < e && indices[lo] == i) d = lo;
        if (d < 0) return INT64_MIN;
        diag_pos[i] = d;
    }
    // scratch: position of column j in the current row i (or -1)
    std::vector<int64_t> col_pos(n, -1);
    for (int64_t i = 0; i != n; ++i) {
        int64_t s = indptr[i], e = indptr[i + 1];
        for (int64_t p = s; p != e; ++p) col_pos[indices[p]] = p;
        for (int64_t kk = s; kk != diag_pos[i]; ++kk) {
            int64_t k = indices[kk];
            double akk = data[diag_pos[k]];
            if (akk == 0.0) {
                for (int64_t p = s; p != e; ++p) col_pos[indices[p]] = -1;
                return -(k + 1);
            }
            double lik = data[kk] / akk;
            data[kk] = lik;
            for (int64_t p = diag_pos[k] + 1; p != indptr[k + 1]; ++p) {
                int64_t cp = col_pos[indices[p]];
                if (cp >= 0) data[cp] -= lik * data[p];
            }
        }
        for (int64_t p = s; p != e; ++p) col_pos[indices[p]] = -1;
    }
    return 0;
}

// Topological levels of a triangular solve: level[i] = 1 + max level of the
// strictly-lower (lower=1) / strictly-upper (lower=0) dependencies of row i.
// One O(nnz) pass (rows in dependency order); feeds the level-scheduled
// traced solves in solve/tri.py (cf. Ifpack2's local sweep scheduling,
// solve/Ifpack2Preconditioners.hpp:97).
void tri_levels(const int64_t* indices, const int64_t* indptr, int64_t n,
                int lower, int64_t* level) {
    if (lower) {
        for (int64_t i = 0; i != n; ++i) {
            int64_t lv = 0;
            for (int64_t p = indptr[i]; p != indptr[i + 1]; ++p) {
                int64_t j = indices[p];
                if (j < i && level[j] >= lv) lv = level[j] + 1;
            }
            level[i] = lv;
        }
    } else {
        for (int64_t i = n - 1; i >= 0; --i) {
            int64_t lv = 0;
            for (int64_t p = indptr[i]; p != indptr[i + 1]; ++p) {
                int64_t j = indices[p];
                if (j > i && level[j] >= lv) lv = level[j] + 1;
            }
            level[i] = lv;
        }
    }
}

int host_ops_abi_version() { return 3; }

}  // extern "C"
