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


@dataclass
class Klu2:
    """Host sparse LU via scipy SuperLU on the Dirichlet-eliminated CSR."""

    def solve(self, system) -> IterSolveResult:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        data, indices, indptr, n = system.eliminated_csr()
        A = sp.csr_matrix((np.asarray(data), np.asarray(indices), np.asarray(indptr)), shape=(n, n))
        b = np.asarray(system.effective_rhs())
        lu = spla.splu(A.tocsc())
        x = np.stack([lu.solve(b[:, j]) for j in range(b.shape[1])], axis=1)
        system.set_solution_vector(jnp.asarray(x, dtype=b.dtype))
        r = A @ x - b
        bn = np.linalg.norm(b, axis=0)
        res = float(np.max(np.linalg.norm(r, axis=0) / np.where(bn > 0, bn, 1.0)))
        return IterSolveResult(tol=res, num_iters=0)


@dataclass
class Lapack:
    """Dense on-device solve of the Dirichlet-eliminated system."""

    def solve(self, system) -> IterSolveResult:
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
