"""Static condensation and matrix-free evaluation (reference examples 05/06).

The same high-order 2D diffusion problem solved three ways -- fully
assembled, assembled with ELEMENT_BOUNDARY static condensation, and
matrix-free with sum factorization -- all reaching the same answer.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import l3ster_tpu as lt
from l3ster_tpu.models.kernels import adiabatic_bc_2d, diffusion_2d


def solve(params, solver, order=4):
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0, 1, 4)), order=order)
    problem = lt.ProblemDefinition(3, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([3, 4], [0])
    system = lt.make_algebraic_system(mesh, problem, bcs, params)
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=2, n_equations=1)
    )
    system.set_dirichlet_bc_values(kdir, [3, 4], [0])
    system.begin_assembly()
    system.assemble_problem(diffusion_2d(), [0])
    system.assemble_problem(adiabatic_bc_2d(), [1, 2])
    system.end_assembly()
    res = system.solve(solver)
    manager = lt.SolutionManager(mesh, 3)
    system.update_solution([0, 1, 2], manager, [0, 1, 2])

    def err(i, o):
        o[0] = i.field_vals[0] - i.point.x
        o[1] = i.field_vals[1] - 1.0
        o[2] = i.field_vals[2]

    ek = lt.wrap_domain_residual_kernel(err, lt.KernelParams(dimension=2, n_equations=3, n_fields=3))
    e = np.linalg.norm(
        np.array(lt.compute_norm_l2(ek, mesh, [0], manager.field_access([0, 1, 2])))
    )
    return system, res, e


if __name__ == "__main__":
    cg = lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=5000), precond=lt.Jacobi())

    s1, r1, e1 = solve(lt.AlgebraicSystemParams(), lt.Klu2())
    print(f"assembled           : {s1.describe()}\n  -> error {e1:.2e}")

    s2, r2, e2 = solve(
        lt.AlgebraicSystemParams(cond_policy=lt.CondensationPolicy.ELEMENT_BOUNDARY), lt.Klu2()
    )
    print(f"static condensation : {s2.describe()}\n  -> error {e2:.2e}")

    s3, r3, e3 = solve(
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE), cg()
    )
    print(f"matrix-free sum-fact: {s3.describe()}\n  -> {r3.num_iters} CG iters, error {e3:.2e}")

    assert max(e1, e2, e3) < 1e-8
    assert s2.n_dofs < s1.n_dofs
    print("OK")
