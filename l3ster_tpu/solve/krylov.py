"""Krylov solvers in pure JAX.

Analogs of the Belos-backed CG / GMRES (``solve/BelosSolvers.hpp:116-127``),
re-implemented as jit-compiled ``lax.while_loop`` iterations.  The operator is
any linear callable on (n_dofs, n_rhs) multivectors; dot products are plain
``jnp`` reductions, so under sharding XLA lowers them to ``psum`` collectives
over the device mesh (the analog of the reference's MPI allreduce per
iteration).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from .interface import IterSolveResult, IterSolverOpts
from .precond import Identity

__all__ = ["cg_solve", "gmres_solve", "CG", "Gmres"]


def _precond_parts(precond, system):
    """(apply(r, *consts), consts) for a preconditioner; falls back to the
    closure-style setup() for third-party preconditioners (small state only)."""
    setup_parts = getattr(precond, "setup_parts", None)
    if setup_parts is not None:
        return setup_parts(system)
    M = precond.setup(system)
    return (lambda r, *pc: M(r)), ()


def _col_dots(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-column inner products of (..., n_rhs) multivectors -> (n_rhs,).

    All leading axes are reduced, so the same code serves single-device
    (n, n_rhs) vectors and sharded stacked (n_shards, n_local, n_rhs) layouts
    (where the reduction lowers to a psum over the device mesh).
    """
    return jnp.sum(a * b, axis=tuple(range(a.ndim - 1)))


def cg_solve(operator, b, x0=None, precond=None, tol=1e-10, max_iters=1000):
    """Preconditioned conjugate gradients on an SPD operator; multivector RHS.

    Each right-hand-side column iterates with its own step lengths (the
    analog of Belos "Block CG" pseudo-block mode).  Returns (x, n_iters,
    achieved relative residual).
    """
    b = jnp.atleast_2d(b.T).T if b.ndim == 1 else b
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = precond if precond is not None else (lambda r: r)

    bnorm = jnp.sqrt(_col_dots(b, b))
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

    r0 = b - operator(x0)
    z0 = M(r0)
    rz0 = _col_dots(r0, z0)

    def cond(state):
        x, r, z, p, rz, it = state
        res = jnp.sqrt(_col_dots(r, r)) / bnorm
        return jnp.logical_and(it < max_iters, jnp.max(res) > tol)

    def body(state):
        x, r, z, p, rz, it = state
        Ap = operator(p)
        pAp = _col_dots(p, Ap)
        alpha = jnp.where(pAp != 0, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _col_dots(r, z)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    state = (x0, r0, z0, z0, rz0, jnp.asarray(0))
    x, r, _, _, _, it = jax.lax.while_loop(cond, body, state)
    res = jnp.max(jnp.sqrt(_col_dots(r, r)) / bnorm)
    return x, it, res


def gmres_solve(operator, b, x0=None, precond=None, tol=1e-10, max_iters=1000, restart=50):
    """Restarted GMRES via jax.scipy (left-preconditioned), column by column."""
    from jax.scipy.sparse.linalg import gmres as jax_gmres

    b2 = b[:, None] if b.ndim == 1 else b
    x0 = jnp.zeros_like(b2) if x0 is None else (x0[:, None] if x0.ndim == 1 else x0)
    M = precond if precond is not None else (lambda r: r)

    cols = []
    for j in range(b2.shape[1]):
        bj = b2[:, j : j + 1]
        op1 = lambda v: operator(v)
        xj, _ = jax_gmres(
            op1,
            bj,
            x0=x0[:, j : j + 1],
            tol=tol,
            atol=0.0,
            restart=restart,
            maxiter=max(1, max_iters // max(restart, 1)),
            M=M,
            solve_method="batched",
        )
        cols.append(xj)
    x = jnp.concatenate(cols, axis=1)
    r = b2 - operator(x)
    bn = jnp.sqrt(_col_dots(b2, b2))
    res = jnp.max(jnp.sqrt(_col_dots(r, r)) / jnp.where(bn > 0, bn, 1.0))
    return (x[:, 0] if b.ndim == 1 else x), jnp.asarray(-1), res


@dataclass
class CG:
    """User-facing CG solver (``solve/BelosSolvers.hpp:116``)."""

    opts: IterSolverOpts = field(default_factory=IterSolverOpts)
    precond: object = field(default_factory=Identity)

    def solve(self, system) -> IterSolveResult:
        fn, consts = system.operator_parts()
        M_fn, M_consts = _precond_parts(self.precond, system)
        b = system.effective_rhs()
        tol, max_iters = self.opts.tol, self.opts.max_iters
        n_oc = len(consts)

        @jax.jit
        def solve_fn(b, x0, *all_consts):
            oc = all_consts[:n_oc]
            pc = all_consts[n_oc:]
            return cg_solve(
                lambda v: fn(v, *oc), b, x0=x0,
                precond=lambda r: M_fn(r, *pc), tol=tol, max_iters=max_iters,
            )

        x, it, res = solve_fn(b, system.solution_vector(), *consts, *M_consts)
        system.set_solution_vector(x)
        return IterSolveResult(tol=float(res), num_iters=int(it))


@dataclass
class Gmres:
    """User-facing restarted GMRES solver (``solve/BelosSolvers.hpp:124``)."""

    opts: IterSolverOpts = field(default_factory=IterSolverOpts)
    precond: object = field(default_factory=Identity)

    def solve(self, system) -> IterSolveResult:
        fn, consts = system.operator_parts()
        M_fn, M_consts = _precond_parts(self.precond, system)
        b = system.effective_rhs()
        tol, max_iters, restart = self.opts.tol, self.opts.max_iters, self.opts.restart
        n_oc = len(consts)

        @jax.jit
        def solve_fn(b, x0, *all_consts):
            oc = all_consts[:n_oc]
            pc = all_consts[n_oc:]
            return gmres_solve(
                lambda v: fn(v, *oc), b, x0=x0, precond=lambda r: M_fn(r, *pc),
                tol=tol, max_iters=max_iters, restart=restart,
            )

        x, it, res = solve_fn(b, system.solution_vector(), *consts, *M_consts)
        system.set_solution_vector(x)
        return IterSolveResult(tol=float(res), num_iters=int(it))
