"""2D diffusion with strong Dirichlet BCs -- the canonical end-to-end slice.

Reproduces the reference's ``tests/Diffusion2D.hpp`` problem: unknowns
(T, qx, qy) on the unit square, adiabatic (q.n = 0) top/bottom, Dirichlet
T = x on left/right; exact solution T = x, q = (1, 0).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import l3ster_tpu as lt


def diffusion_kernel_2d(inp, out):
    ops, rhs = out
    A0, Ax, Ay = ops
    # -div q = 0
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


def adiabatic_bc(inp, out):
    ops, rhs = out
    A0 = ops[0]
    A0[0, 1] = inp.normal[0]
    A0[0, 2] = inp.normal[1]


def main(eval_strategy=lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY, solver=None):
    domain, bottom, top, left, right = 0, 1, 2, 3, 4
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, 5)), order=2)

    problem = lt.ProblemDefinition(3, [domain])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([left, right], [0])

    params = lt.AlgebraicSystemParams(eval_strategy=eval_strategy)
    system = lt.make_algebraic_system(mesh, problem, bcs, params)
    print(system.describe())

    diffusion = lt.wrap_domain_equation_kernel(
        diffusion_kernel_2d, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )
    neumann = lt.wrap_boundary_equation_kernel(
        adiabatic_bc, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )
    dirichlet = lt.wrap_boundary_residual_kernel(
        lambda inp, out: out.__setitem__(0, inp.point.x),
        lt.KernelParams(dimension=2, n_equations=1),
    )

    opts = lt.AssemblyOptions(value_order=1, derivative_order=0)
    system.set_dirichlet_bc_values(dirichlet, [left, right], [0])
    system.begin_assembly()
    system.assemble_problem(diffusion, [domain], options=opts)
    system.assemble_problem(neumann, [bottom, top])
    system.end_assembly()

    solver = solver or lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Jacobi())
    result = system.solve(solver)
    print(f"solve: {result.num_iters} iters, residual {result.tol:.3e}")

    manager = lt.SolutionManager(mesh, 3)
    system.update_solution([0, 1, 2], manager, [0, 1, 2])

    def error_kernel(inp, out):
        T, qx, qy = inp.field_vals[0], inp.field_vals[1], inp.field_vals[2]
        out[0] = T - inp.point.x
        out[1] = qx - 1.0
        out[2] = qy

    err_dom = lt.wrap_domain_residual_kernel(
        error_kernel, lt.KernelParams(dimension=2, n_equations=3, n_fields=3)
    )
    err_bnd = lt.wrap_boundary_residual_kernel(
        error_kernel, lt.KernelParams(dimension=2, n_equations=3, n_fields=3)
    )
    fa = manager.field_access([0, 1, 2])
    e_dom = lt.compute_norm_l2(err_dom, mesh, [domain], fa, options=opts)
    e_bnd = lt.compute_norm_l2(err_bnd, mesh, [bottom, top, left, right], fa)
    print("L2 domain error:  ", np.array(e_dom).ravel())
    print("L2 boundary error:", np.array(e_bnd).ravel())
    return np.array(e_dom).ravel(), np.array(e_bnd).ravel()


if __name__ == "__main__":
    print("== assembled / CG+Jacobi ==")
    e1, b1 = main()
    print("== matrix-free / CG+Jacobi ==")
    e2, b2 = main(lt.OperatorEvaluationStrategy.MATRIX_FREE)
    print("== assembled / KLU2 direct ==")
    e3, b3 = main(solver=lt.Klu2())
    for e in (e1, b1, e2, b2, e3, b3):
        assert np.linalg.norm(e) < 1e-8, e
    print("ALL OK")
