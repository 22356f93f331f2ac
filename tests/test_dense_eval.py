"""Dense basis-matrix (MXU) operator path vs the sum-factorized oracle.

The dense path (``ops/dense_eval.py``) must agree with the sum-factorized
matrix-free apply to machine precision in f64: same least-squares operator,
different nodes<->QPs evaluation scheme.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import l3ster_tpu as lt
from l3ster_tpu.common.enums import LocalEvalStrategy


def _diffusion_3d(inp, out):
    ops, rhs = out
    A0, Ax, Ay, Az = ops
    Ax[0, 1] = -1.0
    Ay[0, 2] = -1.0
    Az[0, 3] = -1.0
    A0[1, 1] = -1.0
    Ax[1, 0] = 1.0
    A0[2, 2] = -1.0
    Ay[2, 0] = 1.0
    A0[3, 3] = -1.0
    Az[3, 0] = 1.0
    Ay[4, 3] = 1.0
    Az[4, 2] = -1.0
    Ax[5, 3] = -1.0
    Az[5, 1] = 1.0
    Ax[6, 2] = 1.0
    Ay[6, 1] = -1.0


def _var_3d(inp, out):
    ops, rhs = out
    A0, Ax, Ay, Az = ops
    k = 1.0 + inp.point.x * inp.point.y + 0.3 * inp.point.z
    Ax[0, 1] = -k
    Ay[0, 2] = -k
    Az[0, 3] = -k
    A0[1, 1] = -1.0
    Ax[1, 0] = 1.0
    A0[2, 2] = -1.0
    Ay[2, 0] = 1.0
    A0[3, 3] = -1.0
    Az[3, 0] = 1.0


def _diffusion_2d(inp, out):
    ops, rhs = out
    A0, Ax, Ay = ops
    Ax[0, 1] = -1.0
    Ay[0, 2] = -1.0
    A0[1, 1] = -1.0
    Ax[1, 0] = 1.0
    A0[2, 2] = -1.0
    Ay[2, 0] = 1.0


def _mf_system(mesh, kernel, strategy, n_unknowns):
    problem = lt.ProblemDefinition(n_unknowns, [0])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
    )
    system = lt.make_algebraic_system(mesh, problem, None, params)
    system.begin_assembly()
    system.assemble_problem(
        kernel, [0], options=lt.AssemblyOptions(eval_strategy=strategy)
    )
    system.end_assembly()
    return system


@pytest.mark.parametrize("order", [2, 3, 4, 6])
def test_dense_matches_sumfact_3d_const(order):
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0, 1, 3)), order=order)
    kd = lt.wrap_domain_equation_kernel(
        _diffusion_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    s_sf = _mf_system(mesh, kd, LocalEvalStrategy.SUM_FACT, 4)
    s_dn = _mf_system(mesh, kd, LocalEvalStrategy.DENSE_MXU, 4)
    x = jnp.asarray(np.random.default_rng(order).normal(size=(s_sf.n_dofs, 1)))
    y1, y2 = s_sf.operator()(x), s_dn.operator()(x)
    assert float(jnp.abs(y1 - y2).max() / jnp.abs(y1).max()) < 1e-12


def test_dense_matches_sumfact_3d_variable():
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0, 1, 3)), order=3)
    kd = lt.wrap_domain_equation_kernel(
        _var_3d, lt.KernelParams(dimension=3, n_equations=4, n_unknowns=4)
    )
    s_sf = _mf_system(mesh, kd, LocalEvalStrategy.SUM_FACT, 4)
    s_dn = _mf_system(mesh, kd, LocalEvalStrategy.DENSE_MXU, 4)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(s_sf.n_dofs, 1)))
    y1, y2 = s_sf.operator()(x), s_dn.operator()(x)
    assert float(jnp.abs(y1 - y2).max() / jnp.abs(y1).max()) < 1e-12


def test_dense_matches_direct_2d():
    # distorted 2D quad mesh so Jacobians vary per QP
    mesh = lt.generate_mesh(
        lt.make_square_mesh(np.linspace(0, 1, 4), np.linspace(0, 2, 4)), order=4
    )
    kd = lt.wrap_domain_equation_kernel(
        _diffusion_2d, lt.KernelParams(dimension=2, n_equations=3, n_unknowns=3)
    )
    s_dir = _mf_system(mesh, kd, LocalEvalStrategy.DIRECT, 3)
    s_dn = _mf_system(mesh, kd, LocalEvalStrategy.DENSE_MXU, 3)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(s_dir.n_dofs, 1)))
    y1, y2 = s_dir.operator()(x), s_dn.operator()(x)
    assert float(jnp.abs(y1 - y2).max() / jnp.abs(y1).max()) < 1e-12
