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


def _source_kernel_2d(inp, out):
    """Diffusion system with a spatially-varying source (nonzero rhs)."""
    diffusion_kernel_2d(inp, out)
    _, rhs = out
    rhs[0] = 1.0 + inp.point.x
    rhs[1] = inp.point.y


def _build_condensed(split: bool, policy=None):
    policy = lt.CondensationPolicy.ELEMENT_BOUNDARY if policy is None else policy
    order, n = 3, 4
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, n)), order=order)
    problem = lt.ProblemDefinition(3, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT, RIGHT], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs, lt.AlgebraicSystemParams(cond_policy=policy)
    )
    source = lt.wrap_domain_equation_kernel(
        _source_kernel_2d, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )
    neumann = lt.wrap_boundary_equation_kernel(
        adiabatic_bc, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )
    opts = lt.AssemblyOptions(value_order=1, derivative_order=0)
    system.begin_assembly()
    if split:
        system.define_operator(source, [DOMAIN], options=opts)
        system.init_problem(source, [DOMAIN], options=opts)
    else:
        system.assemble_problem(source, [DOMAIN], options=opts)
    system.assemble_problem(neumann, [BOTTOM, TOP])
    system.end_assembly()
    return system


def test_condensation_rhs_mode_assembly():
    """init_problem (rhs-only) routed through the condensed path must match
    mode='both' assembly exactly (round-3 advisor high finding: _add_condensed
    unpacked local_rhs output as a (K, F) pair)."""
    s0 = _build_condensed(split=False)
    s1 = _build_condensed(split=True)
    np.testing.assert_allclose(np.asarray(s1.data), np.asarray(s0.data), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s1.rhs), np.asarray(s0.rhs), rtol=1e-12, atol=1e-12)
    s0.solve(lt.Klu2())
    s1.solve(lt.Klu2())
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s0.x), rtol=1e-9, atol=1e-11)


def test_assembled_cross_epoch_caching():
    """Two assembly epochs with different field values through the cached
    _local_kf pass must match a fresh system (round-3 advisor: the assembled
    analog of the matrix-free cross-epoch caching test), both uncondensed and
    ELEMENT_BOUNDARY-condensed."""
    order, n = 2, 3
    for policy in (lt.CondensationPolicy.NONE, lt.CondensationPolicy.ELEMENT_BOUNDARY):
        mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, n)), order=order)
        problem = lt.ProblemDefinition(1, [DOMAIN])
        bcs = lt.BCDefinition(problem)
        bcs.define_dirichlet([LEFT, RIGHT])

        def fdep_kernel(inp, out):
            ops, rhs = out
            A0, Ax, Ay = ops
            k = 1.0 + inp.field_vals[0]
            Ax[0, 0] = k
            Ay[0, 0] = k
            A0[1, 0] = 1.0
            rhs[1] = inp.field_vals[0]

        kern = lt.wrap_domain_equation_kernel(
            fdep_kernel,
            lt.KernelParams(dimension=2, n_equations=2, n_unknowns=1, n_fields=1),
        )
        opts = lt.AssemblyOptions(value_order=1, derivative_order=0)

        def assemble(system, manager):
            system.begin_assembly()
            system.assemble_problem(
                kern, [DOMAIN], manager.field_access([0]), options=opts
            )
            system.end_assembly()

        params = lt.AlgebraicSystemParams(cond_policy=policy)
        sys_a = lt.make_algebraic_system(mesh, problem, bcs, params)
        man = lt.SolutionManager(mesh, 1)
        coords = np.asarray(mesh.node_coords)
        man.values = man.values.at[:, 0].set(coords[:, 0] * coords[:, 1])
        assemble(sys_a, man)  # epoch 1 populates the cache
        jfns_epoch1 = {k: v[0] for k, v in sys_a._kf_cache.items()}
        man.values = man.values.at[:, 0].set(coords[:, 0] - 2.0 * coords[:, 1])
        assemble(sys_a, man)  # epoch 2 reuses it with new field data
        # the jitted pass identity must be reused, not re-built
        for k, v in sys_a._kf_cache.items():
            assert jfns_epoch1.get(k) is v[0], "cached _local_kf fn was rebuilt"

        sys_b = lt.make_algebraic_system(mesh, problem, bcs, params)
        assemble(sys_b, man)  # fresh system at epoch-2 field values
        np.testing.assert_allclose(
            np.asarray(sys_a.data), np.asarray(sys_b.data), rtol=1e-12, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(sys_a.rhs), np.asarray(sys_b.rhs), rtol=1e-12, atol=1e-12
        )


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
