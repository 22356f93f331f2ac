"""Differentiable linear solves (adjoint method).

No reference analog: L3STER's C++/Trilinos stack cannot differentiate
through its solvers.  Here the whole pipeline is a JAX program, so making
the solve itself differentiable turns the framework into a PDE-constrained
optimization engine (coefficient recovery, source identification, inverse
problems) with zero extra user machinery.

The implicit-function-theorem rule for ``K(theta) u = b(theta)``:

    dL/d theta = - lambda^T (dK/d theta) u + lambda^T db/d theta,
    K^T lambda = (dL/du)^T

so one extra linear solve (the *adjoint solve*) per backward pass, plus one
VJP of the operator apply with respect to its parameters.  For the LSFEM
normal equations K = A^T A is symmetric, so the adjoint solve reuses the
forward operator (and CG); nonsymmetric operators get the exact transpose
via ``jax.linear_transpose`` and GMRES.

Usage — gradients w.r.t. the operator's packed tensors and the RHS::

    fn, consts = system.operator_parts()

    def loss(theta):
        consts_t = reparameterize(consts, theta)     # any traceable map
        u = linear_solve(fn, consts_t, b(theta), tol=1e-12)
        return objective(u)

    g = jax.grad(loss)(theta)

The preconditioner and the initial guess affect only the iteration path,
never the converged solution, so their cotangents are exactly zero (they are
declared non-differentiable).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .krylov import cg_solve, gmres_solve

__all__ = ["linear_solve"]


def _neg(ct):
    """Negate a cotangent pytree, leaving float0 (int/bool leaves) alone."""
    return jax.tree_util.tree_map(
        lambda t: -t if jnp.issubdtype(jnp.result_type(t), jnp.inexact) else t, ct
    )


def _zero_ct(t):
    """Zero cotangent for one primal leaf (float0 for int/bool leaves)."""
    if jnp.issubdtype(jnp.result_type(t), jnp.inexact):
        return jnp.zeros_like(t)
    return np.zeros(jnp.shape(t), jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _solve(fn, M_fn, opts, consts, M_consts, b, x0):
    u, _, _ = _run(fn, M_fn, opts, consts, M_consts, b, x0)
    return u


def _run(fn, M_fn, opts, consts, M_consts, b, x0):
    tol, max_iters, symmetric, restart = opts
    op = lambda v: fn(v, *consts)  # noqa: E731
    M = (lambda r: M_fn(r, *M_consts)) if M_fn is not None else None
    if symmetric:
        return cg_solve(op, b, x0=x0, precond=M, tol=tol, max_iters=max_iters)
    return gmres_solve(
        op, b, x0=x0, precond=M, tol=tol, max_iters=max_iters, restart=restart
    )


def _solve_fwd(fn, M_fn, opts, consts, M_consts, b, x0):
    u = _solve(fn, M_fn, opts, consts, M_consts, b, x0)
    return u, (consts, M_consts, u)


def _solve_bwd(fn, M_fn, opts, residuals, gbar):
    consts, M_consts, u = residuals
    tol, max_iters, symmetric, restart = opts
    if symmetric:
        op_T = lambda v: fn(v, *consts)  # noqa: E731  (K = K^T)
    else:
        transpose = jax.linear_transpose(lambda v: fn(v, *consts), u)
        op_T = lambda v: transpose(v)[0]  # noqa: E731
    M = (lambda r: M_fn(r, *M_consts)) if M_fn is not None else None
    if symmetric:
        lam, _, _ = cg_solve(op_T, gbar, precond=M, tol=tol, max_iters=max_iters)
    else:
        # the forward preconditioner approximates K, not K^T; GMRES converges
        # regardless (M changes the path, not the answer), so reuse it
        lam, _, _ = gmres_solve(
            op_T, gbar, precond=M, tol=tol, max_iters=max_iters, restart=restart
        )
    # d_consts = -lambda^T (dK/d consts) u : one VJP of the apply at (u, consts)
    _, vjp_consts = jax.vjp(lambda cs: fn(u, *cs), consts)
    (d_consts,) = vjp_consts(lam)
    d_M = jax.tree_util.tree_map(_zero_ct, M_consts)
    d_x0 = jnp.zeros_like(u)
    return _neg(d_consts), d_M, lam, d_x0


_solve.defvjp(_solve_fwd, _solve_bwd)


def linear_solve(
    fn,
    consts,
    b,
    *,
    x0=None,
    precond=None,
    precond_consts=(),
    tol: float = 1e-10,
    max_iters: int = 1000,
    symmetric: bool = True,
    restart: int = 50,
):
    """Solve ``fn(u, *consts) = b`` for ``u``, differentiably.

    Parameters mirror :func:`l3ster_tpu.solve.krylov.cg_solve` /
    :func:`gmres_solve` in ``operator_parts`` form: ``fn(x, *consts)`` is the
    (constrained) operator apply and ``consts`` its packed tensors — exactly
    what ``system.operator_parts()`` returns.  Gradients flow through
    ``consts`` and ``b`` via the adjoint method (one extra solve per backward
    pass); ``precond``/``precond_consts`` (a ``setup_parts``-style pair) and
    ``x0`` receive zero cotangents, as the converged solution does not depend
    on them.

    ``symmetric=True`` (the LSFEM normal equations) uses CG both ways;
    ``symmetric=False`` uses GMRES forward and the exact
    ``jax.linear_transpose`` of the operator backward.
    """
    squeeze = b.ndim == 1
    b2 = b[:, None] if squeeze else b
    x0 = jnp.zeros_like(b2) if x0 is None else (x0[:, None] if squeeze else x0)
    opts = (float(tol), int(max_iters), bool(symmetric), int(restart))
    u = _solve(fn, precond, opts, tuple(consts), tuple(precond_consts), b2, x0)
    return u[:, 0] if squeeze else u
