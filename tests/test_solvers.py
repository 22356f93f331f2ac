"""Solver x preconditioner matrix tests on a hand-built SPD system.

The analog of ``tests/SolverTests.cpp:14-41``: a small 1D-Laplacian-like SPD
matrix solved with every solver/preconditioner combination, checked against a
dense factorization.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import l3ster_tpu as lt


class _DenseSystem:
    """Minimal system-protocol wrapper around an explicit SPD matrix."""

    def __init__(self, A: np.ndarray, b: np.ndarray):
        self.A = jnp.asarray(A)
        self.b = jnp.asarray(b).reshape(len(b), -1)
        self.n_dofs = A.shape[0]
        self.x = jnp.zeros_like(self.b)

    def operator_parts(self):
        return (lambda x, A: A @ x), (self.A,)

    def operator(self):
        fn, consts = self.operator_parts()
        return lambda x: fn(x, *consts)

    def effective_rhs(self):
        return self.b

    def diagonal(self):
        return jnp.diagonal(self.A)

    def solution_vector(self):
        return self.x

    def set_solution_vector(self, x):
        self.x = x.reshape(self.b.shape)

    def eliminated_csr(self):
        A = np.asarray(self.A)
        n = A.shape[0]
        indptr = np.arange(n + 1) * n
        indices = np.tile(np.arange(n), n)
        return jnp.asarray(A.reshape(-1)), indices, indptr, n


def _spd_system(n=60, n_rhs=2, seed=0):
    rng = np.random.default_rng(seed)
    # 1D Laplacian + mass: SPD, moderately conditioned
    A = 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1) + 0.1 * np.diag(rng.uniform(1, 2, n))
    b = rng.normal(size=(n, n_rhs))
    return _DenseSystem(A, b), np.linalg.solve(A, b)


SOLVERS = [
    ("cg-identity", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000))),
    ("cg-jacobi", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Jacobi())),
    ("cg-richardson", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=4000), precond=lt.Richardson(0.4))),
    ("cg-chebyshev", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Chebyshev())),
    ("gmres-identity", lambda: lt.Gmres(lt.IterSolverOpts(tol=1e-10, max_iters=4000))),
    ("gmres-jacobi", lambda: lt.Gmres(lt.IterSolverOpts(tol=1e-10, max_iters=4000), precond=lt.Jacobi())),
    ("klu2", lt.Klu2),
    ("lapack", lt.Lapack),
]


@pytest.mark.parametrize("name,make", SOLVERS, ids=[s[0] for s in SOLVERS])
def test_solver_on_spd_matrix(name, make):
    system, x_exact = _spd_system()
    res = make().solve(system)
    x = np.asarray(system.solution_vector())
    err = np.abs(x - x_exact).max() / np.abs(x_exact).max()
    assert err < 1e-7, (name, err, res)


def test_cg_reports_convergence_failure():
    system, _ = _spd_system()
    res = lt.CG(lt.IterSolverOpts(tol=1e-14, max_iters=3)).solve(system)
    assert res.num_iters == 3 and res.tol > 1e-14  # honest non-convergence report
