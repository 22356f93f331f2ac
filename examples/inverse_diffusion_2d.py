"""PDE-constrained source identification via differentiable solves.

No reference analog: L3STER's C++/Trilinos stack cannot differentiate through
its solvers.  Here the whole pipeline is a JAX program, so ``lt.linear_solve``
(the adjoint-method custom_vjp over CG, ``solve/adjoint.py``) turns the
framework into an inverse-problem engine with zero extra machinery: JAX
composes d(loss)/d(theta) from one extra CG solve per gradient.

Setup: 2D diffusion (unknowns T, qx, qy, first-order LSFEM system) on the
unit square, T = 0 on left/right, adiabatic top/bottom.  The true source is
a combination of three Gaussian bumps, f = sum_i theta*_i phi_i.  We observe
the TEMPERATURE field only (the T dofs of the forward solution), then recover
theta by Adam on  loss(theta) = ||T(theta) - T_obs||^2,  where each
evaluation of T(theta) is a full CG solve of the LSFEM normal equations.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

import l3ster_tpu as lt

DOMAIN, BOTTOM, TOP, LEFT, RIGHT = 0, 1, 2, 3, 4
THETA_TRUE = np.array([1.5, -0.7, 0.9])
CENTERS = np.array([[0.25, 0.3], [0.6, 0.7], [0.8, 0.2]])


def diffusion_kernel(source_fn):
    def kern(inp, out):
        ops, rhs = out
        A0, Ax, Ay = ops
        # -div q = -f
        Ax[0, 1] = -1.0
        Ay[0, 2] = -1.0
        # grad T - q = 0
        A0[1, 1] = -1.0
        Ax[1, 0] = 1.0
        A0[2, 2] = -1.0
        Ay[2, 0] = 1.0
        # curl q = 0
        Ax[3, 2] = 1.0
        Ay[3, 1] = -1.0
        if source_fn is not None:
            rhs[0] = -source_fn(inp.point.x, inp.point.y)

    return kern


def adiabatic_bc(inp, out):
    ops, _ = out
    ops[0][0, 1] = inp.normal[0]
    ops[0][0, 2] = inp.normal[1]


def bump(i):
    cx, cy = CENTERS[i]
    return lambda x, y: jnp.exp(-40.0 * ((x - cx) ** 2 + (y - cy) ** 2))


def assemble(system, source_fn):
    kd = lt.wrap_domain_equation_kernel(
        diffusion_kernel(source_fn),
        lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3),
    )
    kn = lt.wrap_boundary_equation_kernel(
        adiabatic_bc, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )
    system.begin_assembly()
    system.assemble_problem(kd, [DOMAIN])
    system.assemble_problem(kn, [BOTTOM, TOP])
    system.end_assembly()


def main():
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, 9)), order=2)
    problem = lt.ProblemDefinition(3, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT, RIGHT], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(
            eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
        ),
    )
    system.set_dirichlet_bc_values(0.0, [LEFT, RIGHT], [0])

    # One RHS vector per source basis function (the operator is unchanged:
    # same kernel structure -> same traced fn, only the load varies).
    basis_rhs = []
    for i in range(len(CENTERS)):
        assemble(system, bump(i))
        basis_rhs.append(system.effective_rhs())
    B = jnp.stack(basis_rhs, axis=0)  # (3, n_dofs, 1)
    fn, consts = system.operator_parts()

    # T dofs: unknown 0 of each node (local dof = node*n_unk + unknown).
    t_dofs = jnp.arange(system.n_dofs // 3) * 3

    def forward(theta):
        b = jnp.tensordot(theta, B, axes=1)
        u = lt.linear_solve(fn, consts, b, tol=1e-12, max_iters=4000)
        return u[t_dofs, 0]

    T_obs = forward(jnp.asarray(THETA_TRUE))
    print(f"observations: {T_obs.shape[0]} temperature dofs, "
          f"|T|_max = {float(jnp.abs(T_obs).max()):.4f}")

    loss = jax.jit(lambda th: jnp.sum((forward(th) - T_obs) ** 2))
    value_and_grad = jax.jit(jax.value_and_grad(loss))

    # The objective is quadratic in theta, so L-BFGS (each step = one forward
    # CG solve + one adjoint CG solve, composed by JAX) converges in a handful
    # of iterations.
    theta = jnp.zeros(3)
    opt = optax.lbfgs()
    state = opt.init(theta)
    for it in range(25):
        value, g = value_and_grad(theta)
        updates, state = opt.update(
            g, state, theta, value=value, grad=g, value_fn=loss
        )
        theta = optax.apply_updates(theta, updates)
        print(f"iter {it:3d}  loss {float(value):.3e}  "
              f"theta {np.array(theta).round(5)}")
        if float(value) < 1e-16:
            break

    err = float(jnp.abs(theta - jnp.asarray(THETA_TRUE)).max())
    print(f"recovered theta: {np.array(theta).round(6)}")
    print(f"true theta:      {THETA_TRUE}")
    print(f"max |error|:     {err:.2e}")
    assert err < 1e-3, err
    print("OK")


if __name__ == "__main__":
    main()
