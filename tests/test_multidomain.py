"""Multi-domain assembly oracle (MultiDomainTest analog).

The unit square split at x = 0.5 into two domains with different source
terms; the exact solution is piecewise quadratic:
  qx' = -s with s=0 (left), s=2 (right); qx(1) = 0  ->  qx = min(1, 2(1-x))
  T' = qx, T(0) = 0                      ->  T = x (left), 2x - x^2 - 1/4 (right)
Exactly representable at p >= 2, so the LSFEM solve must hit it to 1e-8.
"""

import numpy as np
import pytest

import l3ster_tpu as lt
from l3ster_tpu.mesh.split import split_domain

DOM_L, DOM_R = 0, 10
BOTTOM, TOP, LEFT, RIGHT = 1, 2, 3, 4


def _diffusion_with_source(source):
    def fn(inp, out):
        ops, rhs = out
        A0, Ax, Ay = ops
        Ax[0, 1] = -1.0
        Ay[0, 2] = -1.0
        rhs[0] = source
        A0[1, 1] = -1.0
        Ax[1, 0] = 1.0
        A0[2, 2] = -1.0
        Ay[2, 0] = 1.0
        Ax[3, 2] = 1.0
        Ay[3, 1] = -1.0

    return lt.wrap_domain_equation_kernel(
        fn, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )


def _normal_flux_bc(value=0.0):
    def fn(inp, out):
        ops, rhs = out
        ops[0][0, 1] = inp.normal[0]
        ops[0][0, 2] = inp.normal[1]
        rhs[0] = value

    return lt.wrap_boundary_equation_kernel(
        fn, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )


@pytest.mark.parametrize(
    "strategy",
    [lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY, lt.OperatorEvaluationStrategy.MATRIX_FREE],
)
def test_multidomain_piecewise_source(strategy):
    mesh = lt.make_square_mesh(np.linspace(0, 1, 5))
    mesh = split_domain(mesh, 0, lambda c: c[:, 0] > 0.5, DOM_R)
    mesh = lt.generate_mesh(mesh, order=2)
    assert DOM_L in mesh.domains and DOM_R in mesh.domains

    problem = lt.ProblemDefinition(3)
    problem.define([DOM_L, DOM_R])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs, lt.AlgebraicSystemParams(eval_strategy=strategy)
    )

    system.set_dirichlet_bc_values([0.0], [LEFT], [0])
    system.begin_assembly()
    system.assemble_problem(_diffusion_with_source(0.0), [DOM_L])
    system.assemble_problem(_diffusion_with_source(2.0), [DOM_R])
    system.assemble_problem(_normal_flux_bc(0.0), [BOTTOM, TOP, RIGHT])
    system.end_assembly()
    system.solve(lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=4000), precond=lt.Jacobi()))

    manager = lt.SolutionManager(mesh, 3)
    system.update_solution([0, 1, 2], manager, [0, 1, 2])

    def err(inp, out):
        import jax.numpy as jnp

        x = inp.point.x
        T_exact = jnp.where(x <= 0.5, x, 2 * x - x * x - 0.25)
        qx_exact = jnp.where(x <= 0.5, 1.0, 2 * (1 - x))
        out[0] = inp.field_vals[0] - T_exact
        out[1] = inp.field_vals[1] - qx_exact
        out[2] = inp.field_vals[2]

    ek = lt.wrap_domain_residual_kernel(
        err, lt.KernelParams(dimension=2, n_equations=3, n_fields=3)
    )
    fa = manager.field_access([0, 1, 2])
    e = np.array(lt.compute_norm_l2(ek, mesh, [DOM_L, DOM_R], fa)).ravel()
    assert np.linalg.norm(e) < 1e-8, e


def test_split_preserves_boundaries_and_elements():
    mesh = lt.make_square_mesh(np.linspace(0, 1, 5))
    n_before = sum(b.n_elements for b in mesh.domains[0])
    m2 = split_domain(mesh, 0, lambda c: c[:, 0] > 0.5, DOM_R)
    n_l = sum(b.n_elements for b in m2.domains[0])
    n_r = sum(b.n_elements for b in m2.domains[DOM_R])
    assert n_l + n_r == n_before and n_l == n_r
    assert set(m2.boundary_views) == {1, 2, 3, 4}
    # boundary views now reference both volume domains
    doms = {bv.parent_domain for bid in (1, 2) for bv in m2.boundary_views[bid]}
    assert doms == {0, DOM_R}
