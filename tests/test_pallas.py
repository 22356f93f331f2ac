"""Pallas fused-kernel oracles (interpret mode on CPU).

The fused sum-factorized apply must match the reference const-coefficient
path; the SUM_FACT_PALLAS strategy must run end-to-end through the system.
"""

import numpy as np
import pytest

import l3ster_tpu as lt
from l3ster_tpu.algsys.local import (
    domain_tables,
    element_geometry,
    local_apply_sumfact_const,
)
from l3ster_tpu.algsys.system import _constant_kernel_operators, _pack_geometry_only
from l3ster_tpu.common.enums import LocalEvalStrategy
from l3ster_tpu.mesh.traits import ElementType
from l3ster_tpu.ops.pallas_sumfact import sumfact_const_apply_pallas
from tests.test_diffusion_2d import adiabatic_bc, diffusion_kernel_2d
from tests.test_diffusion_3d import diffusion_kernel_3d


@pytest.mark.parametrize("order", [2, 3])
def test_pallas_matches_const_path_3d(order):
    import jax.numpy as jnp

    k3 = lt.wrap_domain_equation_kernel(
        diffusion_kernel_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    qo = lt.AssemblyOptions().quadrature_order(order)
    tab = domain_tables(ElementType.HEX, order, qo)
    rng = np.random.default_rng(0)
    base = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
        float,
    )
    E = 5
    verts = jnp.asarray(
        np.stack([base + 0.08 * rng.normal(size=base.shape) for _ in range(E)]), jnp.float32
    )
    geom = element_geometry(tab, verts, with_phys_ders=False)
    A = _constant_kernel_operators(k3, 0.0)
    assert A is not None
    Ji_t, w_t = _pack_geometry_only(geom, 3)
    x = jnp.asarray(rng.normal(size=(E, (order + 1) ** 3, 4)), jnp.float32)
    y_ref = local_apply_sumfact_const(A, Ji_t, w_t, E, order, qo, 3, x)
    y_pl = sumfact_const_apply_pallas(
        A, geom.jac_inv, geom.weights, order, qo, 3, x, block_elems=8, interpret=True
    )
    s = float(jnp.abs(y_ref).max())
    assert float(jnp.abs(y_pl - y_ref).max()) < 1e-4 * s


def test_pallas_strategy_end_to_end():
    """Full 2D diffusion solve with SUM_FACT_PALLAS (interpret mode on CPU)."""
    from tests.test_diffusion_2d import _solve

    e_dom, _ = _solve(
        lt.OperatorEvaluationStrategy.MATRIX_FREE,
        lt.CG(lt.IterSolverOpts(tol=1e-10, max_iters=4000), precond=lt.Jacobi()),
        order=3,
        n=4,
    )
    # now with explicit pallas strategy on the domain kernel
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, 4)), order=3)
    problem = lt.ProblemDefinition(3, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([3, 4], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
    )
    kd = lt.wrap_domain_equation_kernel(
        diffusion_kernel_2d, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )
    kn = lt.wrap_boundary_equation_kernel(
        adiabatic_bc, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=2, n_equations=1)
    )
    opts = lt.AssemblyOptions(
        value_order=1, derivative_order=0, eval_strategy=LocalEvalStrategy.SUM_FACT_PALLAS
    )
    system.set_dirichlet_bc_values(kdir, [3, 4], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [0], options=opts)
    system.assemble_problem(kn, [1, 2])
    system.end_assembly()
    res = system.solve(lt.CG(lt.IterSolverOpts(tol=1e-10, max_iters=4000), precond=lt.Jacobi()))
    assert res.tol < 1e-8

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
        lt.compute_norm_l2(ek, mesh, [0], manager.field_access([0, 1, 2]), options=opts)
    ).ravel()
    assert np.linalg.norm(e) < 1e-6, e
