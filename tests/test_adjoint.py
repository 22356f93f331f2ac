"""Differentiable linear solves (``solve/adjoint.py``).

No reference analog: L3STER's C++/Trilinos stack cannot differentiate through
its solvers.  Gradients are validated against a dense ``jnp.linalg.solve``
autodiff oracle (exact adjoint of the exact solve), so agreement checks both
the implicit-function-theorem rule and that the Krylov solves converge tightly
enough for the cotangents to match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import l3ster_tpu as lt
from l3ster_tpu.solve.adjoint import linear_solve


def _spd(n, rng):
    B = rng.normal(size=(n, n))
    return B @ B.T + n * np.eye(n)


def test_grad_matches_dense_oracle_spd():
    """d loss / d theta for K(theta) u = b(theta) vs jnp.linalg.solve autodiff."""
    rng = np.random.default_rng(0)
    n = 12
    K0 = jnp.asarray(_spd(n, rng))
    D = jnp.asarray(_spd(n, rng))  # direction for K(theta) = K0 + theta*D
    b0 = jnp.asarray(rng.normal(size=n))
    w = jnp.asarray(rng.normal(size=n))  # objective weights

    def fn(x, K):
        return K @ x

    def loss(theta):
        K = K0 + theta * D
        b = b0 * (1.0 + theta)
        u = linear_solve(fn, (K,), b, tol=1e-14, max_iters=500)
        return jnp.sum(w * u) + jnp.sum(u**2)

    def oracle(theta):
        K = K0 + theta * D
        u = jnp.linalg.solve(K, b0 * (1.0 + theta))
        return jnp.sum(w * u) + jnp.sum(u**2)

    theta = 0.3
    g = jax.grad(loss)(theta)
    g_ref = jax.grad(oracle)(theta)
    assert abs(float(g - g_ref)) < 1e-9 * max(1.0, abs(float(g_ref)))
    # values agree too
    assert abs(float(loss(theta) - oracle(theta))) < 1e-10


def test_grad_wrt_rhs_is_adjoint_solution():
    """d(w.u)/db = K^{-T} w exactly (the adjoint variable)."""
    rng = np.random.default_rng(1)
    n = 10
    K = jnp.asarray(_spd(n, rng))
    b = jnp.asarray(rng.normal(size=n))
    w = jnp.asarray(rng.normal(size=n))

    g = jax.grad(lambda bb: jnp.sum(w * linear_solve(lambda x, K: K @ x, (K,), bb, tol=1e-14)))(b)
    lam = jnp.linalg.solve(K.T, w)
    assert float(jnp.abs(g - lam).max()) < 1e-10


def test_grad_nonsymmetric_gmres():
    """symmetric=False: GMRES forward, exact linear_transpose backward."""
    rng = np.random.default_rng(2)
    n = 9
    A = jnp.asarray(_spd(n, rng) + 2.0 * rng.normal(size=(n, n)))  # nonsymmetric
    b = jnp.asarray(rng.normal(size=n))

    def loss(K):
        u = linear_solve(
            lambda x, K: K @ x, (K,), b, tol=1e-13, max_iters=400,
            symmetric=False, restart=20,
        )
        return jnp.sum(u**3)

    def oracle(K):
        u = jnp.linalg.solve(K, b)
        return jnp.sum(u**3)

    g = jax.grad(loss)(A)
    g_ref = jax.grad(oracle)(A)
    scale = float(jnp.abs(g_ref).max())
    assert float(jnp.abs(g - g_ref).max()) < 1e-8 * scale


def test_precond_and_x0_get_zero_cotangent():
    """M and x0 change the iteration path, never the answer: zero gradients.
    Also exercises int leaves in precond_consts (float0 cotangents)."""
    rng = np.random.default_rng(3)
    n = 8
    K = jnp.asarray(_spd(n, rng))
    b = jnp.asarray(rng.normal(size=n))
    dinv = 1.0 / jnp.diag(K)
    perm = jnp.arange(n, dtype=jnp.int32)  # int const must not break the VJP

    def M(r, dinv, perm):
        return (dinv[perm])[:, None] * r

    def loss(dinv, x0):
        u = linear_solve(
            lambda x, K: K @ x, (K,), b, x0=x0,
            precond=M, precond_consts=(dinv, perm), tol=1e-14,
        )
        return jnp.sum(u**2)

    g_d, g_x0 = jax.grad(loss, argnums=(0, 1))(dinv, jnp.zeros_like(b))
    assert float(jnp.abs(g_d).max()) == 0.0
    assert float(jnp.abs(g_x0).max()) == 0.0


def test_system_operator_parts_differentiable():
    """End-to-end: gradients through a real matrix-free LSFEM operator.

    Source identification on the 2D diffusion test problem (unknowns
    T, qx, qy): loss(s) = ||u(s) - u*||^2 where the free part of the RHS is
    scaled by s.  The constrained operator acts as the identity on Dirichlet
    dofs, so with g the Dirichlet extension, u(s) = s*(u(1) - g) + g is
    affine in s and dloss/ds has a closed form — checked against it.
    """
    DOMAIN, BOTTOM, TOP, LEFT, RIGHT = 0, 1, 2, 3, 4
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, 4)), order=2)
    problem = lt.ProblemDefinition(3, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT, RIGHT], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(
            eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
        ),
    )

    def kern(inp, out):
        ops, _ = out
        A0, Ax, Ay = ops
        Ax[0, 1] = -1.0
        Ay[0, 2] = -1.0
        A0[1, 1] = -1.0
        Ax[1, 0] = 1.0
        A0[2, 2] = -1.0
        Ay[2, 0] = 1.0
        Ax[3, 2] = 1.0
        Ay[3, 1] = -1.0

    kd = lt.wrap_domain_equation_kernel(
        kern, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )
    dirichlet = lt.wrap_boundary_residual_kernel(
        lambda inp, out: out.__setitem__(0, inp.point.x),
        lt.KernelParams(dimension=2, n_equations=1),
    )
    system.set_dirichlet_bc_values(dirichlet, [LEFT, RIGHT], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [DOMAIN])
    system.end_assembly()

    fn, consts = system.operator_parts()
    b = system.effective_rhs()
    free = system.free_mask[:, None]
    g_dir = b * (1.0 - free)  # Dirichlet part of the effective RHS

    u1 = linear_solve(fn, consts, b, tol=1e-14, max_iters=2000)
    u_star = 0.75 * (u1 - g_dir) + g_dir  # target generated by s* = 0.75

    def loss(s):
        u = linear_solve(fn, consts, s * (b - g_dir) + g_dir, tol=1e-14,
                         max_iters=2000)
        return jnp.sum((u - u_star) ** 2)

    s = 1.2
    g = jax.grad(loss)(s)
    # loss(s) = (s - 0.75)^2 ||u1 - g_dir||^2
    g_ref = 2.0 * (s - 0.75) * float(jnp.sum((u1 - g_dir) ** 2))
    assert abs(float(g) - g_ref) < 1e-8 * abs(g_ref)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
