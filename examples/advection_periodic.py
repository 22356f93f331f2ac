"""Unsteady advection with periodic BCs + BDF3 (reference examples 03/04).

A Gaussian pulse advected across a periodic x-direction; after a full period
it returns to its starting position.  Demonstrates periodic dof aliasing,
per-step Dirichlet values, field history, and the init_problem /
define_operator split for matrix-free time stepping.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import l3ster_tpu as lt
from l3ster_tpu.models.kernels import advection_bdf_2d

NX = np.linspace(-0.5, 0.5, 9)
NY = np.linspace(0.0, 0.5, 5)
W = NX[-1] - NX[0]
DT = 0.025
U = 1.0
BDF_LEADING, BDF_COEFS = 11.0 / 6.0, (3.0, -1.5, 1.0 / 3.0)


def analytic(inp, out):
    x_dv = jnp.mod(inp.point.x - inp.point.time * U - NX[0], W) + NX[0]
    out[0] = jnp.exp(-10.0 * x_dv * x_dv)


def main(order=4, n_steps=None):
    mesh = lt.generate_mesh(lt.make_square_mesh(NX, NY), order=order)
    problem = lt.ProblemDefinition(1, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_periodic([3], [4], [W, 0.0, 0.0])
    bcs.define_dirichlet([1, 2])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
    )

    init_k = advection_bdf_2d((U, 0.0), DT, BDF_LEADING, BDF_COEFS)
    eval_k = advection_bdf_2d((U, 0.0), DT, BDF_LEADING, ())
    sol_k = lt.wrap_domain_residual_kernel(analytic, lt.KernelParams(dimension=2, n_equations=1))
    sol_k_bc = lt.wrap_boundary_residual_kernel(
        analytic, lt.KernelParams(dimension=2, n_equations=1)
    )

    hist = [0, 1, 2]
    manager = lt.SolutionManager(mesh, 3)
    for i in hist:
        manager.set_fields_from_kernel(sol_k, [0], [i], time=-DT * i)
        manager.set_fields_from_kernel(sol_k_bc, [1, 2, 3, 4], [i], time=-DT * i)

    solver = lt.CG(lt.IterSolverOpts(tol=1e-10, max_iters=2000), precond=lt.Jacobi())
    n_steps = n_steps or round(W / DT)
    for step in range(1, n_steps + 1):
        t = step * DT
        system.set_dirichlet_bc_values(sol_k_bc, [1, 2], [0], time=t)
        system.begin_assembly()
        system.init_problem(init_k, [0], manager.field_access(hist))
        system.define_operator(eval_k, [0])
        system.end_assembly()
        system.solve(solver)
        last = hist[-1]
        system.update_solution([0], manager, [last])
        hist = [last] + hist[:-1]

    def err_kernel(inp, out):
        analytic(inp, out)
        out[0] = inp.field_vals[0] - out[0]

    ek = lt.wrap_domain_residual_kernel(
        err_kernel, lt.KernelParams(dimension=2, n_equations=1, n_fields=1)
    )
    e = float(
        lt.compute_norm_l2(ek, mesh, [0], manager.field_access([hist[0]]), time=n_steps * DT)[0, 0]
    )
    err_pct = e / (W * (NY[-1] - NY[0])) * 100
    print(f"normalized L2 error after {n_steps} steps: {err_pct:.3f}%")
    return err_pct


if __name__ == "__main__":
    assert main() < 5.0
    print("OK")
