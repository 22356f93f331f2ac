"""Static condensation oracles.

Mirrors the reference's CondensationPolicy test axis
(``tests/SolverTests.cpp:24-50`` pattern, example 05): the ELEMENT_BOUNDARY
Schur reduction must reproduce the uncondensed solution, shrink the global
system, and recover interior nodal values exactly.
"""

import numpy as np
import pytest

import l3ster_tpu as lt
from tests.test_diffusion_2d import adiabatic_bc, diffusion_kernel_2d

DOMAIN, BOTTOM, TOP, LEFT, RIGHT = 0, 1, 2, 3, 4


def _solve(policy, solver, order=3, n=4):
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, n)), order=order)
    problem = lt.ProblemDefinition(3, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT, RIGHT], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs, lt.AlgebraicSystemParams(cond_policy=policy)
    )
    diffusion = lt.wrap_domain_equation_kernel(
        diffusion_kernel_2d, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )
    neumann = lt.wrap_boundary_equation_kernel(
        adiabatic_bc, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )
    dirichlet = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=2, n_equations=1)
    )
    opts = lt.AssemblyOptions(value_order=1, derivative_order=0)
    system.set_dirichlet_bc_values(dirichlet, [LEFT, RIGHT], [0])
    system.begin_assembly()
    system.assemble_problem(diffusion, [DOMAIN], options=opts)
    system.assemble_problem(neumann, [BOTTOM, TOP])
    system.end_assembly()
    system.solve(solver)
    manager = lt.SolutionManager(mesh, 3)
    system.update_solution([0, 1, 2], manager, [0, 1, 2])

    def err(i, o):
        o[0] = i.field_vals[0] - i.point.x
        o[1] = i.field_vals[1] - 1.0
        o[2] = i.field_vals[2]

    ek = lt.wrap_domain_residual_kernel(
        err, lt.KernelParams(dimension=2, n_equations=3, n_fields=3)
    )
    e = np.array(
        lt.compute_norm_l2(ek, mesh, [DOMAIN], manager.field_access([0, 1, 2]), options=opts)
    ).ravel()
    return system, np.linalg.norm(e)


def test_condensation_reduces_system_and_matches():
    s0, e0 = _solve(lt.CondensationPolicy.NONE, lt.Klu2())
    s1, e1 = _solve(lt.CondensationPolicy.ELEMENT_BOUNDARY, lt.Klu2())
    assert e0 < 1e-8 and e1 < 1e-8
    # interior dofs eliminated: 9 elements x 4 interior nodes x 3 dofs = 108 fewer
    assert s0.n_dofs - s1.n_dofs == 9 * 4 * 3
    assert s1.nnz < s0.nnz


def test_condensation_iterative():
    _, e = _solve(
        lt.CondensationPolicy.ELEMENT_BOUNDARY,
        lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=lt.Jacobi()),
    )
    assert e < 1e-8


def test_condensation_mf_rejected():
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0, 1, 3)), order=2)
    with pytest.raises(ValueError):
        lt.make_algebraic_system(
            mesh,
            lt.ProblemDefinition(1, [0]),
            params=lt.AlgebraicSystemParams(
                eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE,
                cond_policy=lt.CondensationPolicy.ELEMENT_BOUNDARY,
            ),
        )
