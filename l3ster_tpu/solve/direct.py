"""Direct solvers.

Analogs of the Amesos2-backed KLU2 / LAPACK solvers
(``solve/Amesos2Solvers.hpp:40-46``).  There is no TPU-native sparse LU;
``Klu2`` gathers the assembled CSR to the host and runs scipy's SuperLU
(the same role KLU2 plays in the reference), while ``Lapack`` densifies on
device and solves with jnp (fine for small systems and f32 on TPU).
Both require the GLOBAL_ASSEMBLY evaluation strategy.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .interface import IterSolveResult

__all__ = ["Klu2", "Lapack"]


def _host_csr_and_rhs(system):
    """(csr pieces, host rhs, scatter-back fn) for single-device AND
    distributed systems.  The distributed path gathers the per-shard partial
    matrices to one host CSR and scatters the solution back through the
    stacked layout — the Amesos2-on-a-distributed-matrix analog
    (``solve/Amesos2Solvers.hpp:13-49``)."""
    if getattr(system, "gathered_csr", None) is not None:
        data, indices, indptr, n = system.gathered_csr()
        b = system.effective_rhs_global()

        def put(x):
            system._set_solution_global(x)

        return (data, indices, indptr, n), b, put
    data, indices, indptr, n = system.eliminated_csr()
    b = np.asarray(system.effective_rhs())

    def put(x):
        system.set_solution_vector(jnp.asarray(x, dtype=system.dtype))

    return (np.asarray(data), np.asarray(indices), np.asarray(indptr), n), b, put


@dataclass
class Klu2:
    """Host sparse LU via scipy SuperLU on the Dirichlet-eliminated CSR
    (gathered to the host for distributed systems)."""

    def solve(self, system) -> IterSolveResult:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        from ..utils.profiling import profile_region

        with profile_region("solve/klu2_gather"):
            (data, indices, indptr, n), b, put = _host_csr_and_rhs(system)
        A = sp.csr_matrix((np.asarray(data), np.asarray(indices), np.asarray(indptr)), shape=(n, n))
        with profile_region("solve/klu2_factor"):
            lu = spla.splu(A.tocsc())
        with profile_region("solve/klu2_triangular"):
            x = np.stack([lu.solve(b[:, j]) for j in range(b.shape[1])], axis=1)
        put(x)
        r = A @ x - b
        bn = np.linalg.norm(b, axis=0)
        res = float(np.max(np.linalg.norm(r, axis=0) / np.where(bn > 0, bn, 1.0)))
        return IterSolveResult(tol=res, num_iters=0)


@dataclass
class Lapack:
    """Dense on-device solve of the Dirichlet-eliminated system."""

    def solve(self, system) -> IterSolveResult:
        if getattr(system, "gathered_csr", None) is not None:
            (data_np, indices, indptr, n), bh, put = _host_csr_and_rhs(system)
            dense_np = np.zeros((n, n))
            rows = np.repeat(np.arange(n), np.diff(np.asarray(indptr)))
            dense_np[rows, np.asarray(indices)] = np.asarray(data_np)
            x = np.linalg.solve(dense_np, bh)
            put(x)
            r = dense_np @ x - bh
            bn = np.linalg.norm(bh, axis=0)
            res = float(np.max(np.linalg.norm(r, axis=0) / np.where(bn > 0, bn, 1.0)))
            return IterSolveResult(tol=res, num_iters=0)
        data, indices, indptr, n = system.eliminated_csr()
        dense = jnp.zeros((n, n), dtype=data.dtype)
        rows = np.repeat(np.arange(n), np.diff(np.asarray(indptr)))
        dense = dense.at[rows, np.asarray(indices)].add(data)
        b = system.effective_rhs()
        x = jnp.linalg.solve(dense, b)
        system.set_solution_vector(x)
        r = dense @ x - b
        bn = jnp.linalg.norm(b, axis=0)
        res = float(jnp.max(jnp.linalg.norm(r, axis=0) / jnp.where(bn > 0, bn, 1.0)))
        return IterSolveResult(tol=res, num_iters=0)
