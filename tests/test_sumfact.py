"""Sum-factorization oracles.

Mirrors ``tests/SumFactorizationTests.cpp``: the factorized interpolation and
operator apply must match the direct (full-table) evaluation to near machine
precision, on distorted (non-affine) elements.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import l3ster_tpu as lt
from l3ster_tpu.algsys.local import (
    _basis_stack,
    domain_tables,
    element_geometry,
    eval_equation_kernel,
    local_apply_direct,
    local_apply_sumfact,
)
from l3ster_tpu.common.kernel import KernelParams, wrap_domain_equation_kernel
from l3ster_tpu.mesh.traits import ElementType
from l3ster_tpu.ops.sumfact import sumfact_interpolate, sumfact_tables_1d, sumfact_transpose


def _rand_verts(et, seed):
    rng = np.random.default_rng(seed)
    if et == ElementType.QUAD:
        base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=float)
    else:
        base = np.array(
            [
                [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1],
            ],
            dtype=float,
        )
    dim = 2 if et == ElementType.QUAD else 3
    pert = 0.15 * rng.normal(size=base.shape)
    pert[:, dim:] = 0.0
    return jnp.asarray((base + pert)[None])


@pytest.mark.parametrize("et,order", [(ElementType.QUAD, 2), (ElementType.QUAD, 5), (ElementType.HEX, 3)])
def test_interpolation_matches_tables(et, order):
    dim = 2 if et == ElementType.QUAD else 3
    q_order = 2 * order
    tab = domain_tables(et, order, q_order)
    N1, D1, _ = sumfact_tables_1d(order, q_order)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(3, (order + 1) ** dim, 2)))
    vals, rders = sumfact_interpolate(u, jnp.asarray(N1), jnp.asarray(D1), dim)
    vals_ref = jnp.einsum("qn,enc->eqc", jnp.asarray(tab.values), u)
    rders_ref = jnp.einsum("qdn,enc->edqc", jnp.asarray(tab.ref_ders), u)
    assert np.allclose(vals, vals_ref, atol=1e-12)
    assert np.allclose(rders, rders_ref, atol=1e-12)


@pytest.mark.parametrize("et,order", [(ElementType.QUAD, 3), (ElementType.HEX, 2)])
def test_transpose_is_adjoint(et, order):
    dim = 2 if et == ElementType.QUAD else 3
    q_order = 2 * order
    N1, D1, _ = sumfact_tables_1d(order, q_order)
    N1, D1 = jnp.asarray(N1), jnp.asarray(D1)
    nq = N1.shape[0] ** dim
    n_nodes = (order + 1) ** dim
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(1, n_nodes, 1)))
    t0 = jnp.asarray(rng.normal(size=(1, nq, 1)))
    td = jnp.asarray(rng.normal(size=(1, dim, nq, 1)))
    vals, rders = sumfact_interpolate(u, N1, D1, dim)
    y = sumfact_transpose(t0, td, N1, D1, dim)
    lhs = float(jnp.sum(vals * t0) + jnp.sum(rders * td))
    rhs = float(jnp.sum(u * y))
    assert abs(lhs - rhs) < 1e-11 * max(1.0, abs(lhs))


def _diffusion_kernel(dim):
    if dim == 2:
        def fn(inp, out):
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

        return wrap_domain_equation_kernel(fn, KernelParams(dimension=2, n_equations=4, n_unknowns=3))

    def fn(inp, out):
        ops, _ = out
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

    return wrap_domain_equation_kernel(fn, KernelParams(dimension=3, n_equations=7, n_unknowns=4))


@pytest.mark.parametrize(
    "et,order", [(ElementType.QUAD, 2), (ElementType.QUAD, 4), (ElementType.HEX, 2), (ElementType.HEX, 3)]
)
def test_sumfact_apply_matches_direct(et, order):
    dim = 2 if et == ElementType.QUAD else 3
    q_order = 2 * (order + order - 1)
    tab = domain_tables(et, order, q_order)
    verts = _rand_verts(et, seed=order)
    geom = element_geometry(tab, verts)
    kern = _diffusion_kernel(dim)
    A, _ = eval_equation_kernel(kern, geom)
    B = _basis_stack(tab, geom, jnp.float64)
    n_unk = kern.params.n_unknowns
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, (order + 1) ** dim, n_unk)))
    y_direct = local_apply_direct(A, B, geom.weights, x)
    y_sf = local_apply_sumfact(A, geom, order, q_order, dim, x)
    scale = float(jnp.abs(y_direct).max())
    assert np.allclose(y_sf, y_direct, atol=1e-11 * scale), float(jnp.abs(y_sf - y_direct).max())


def test_mf_sumfact_end_to_end():
    """Whole solve with AUTO (sum-fact) matches DIRECT local evaluation."""
    from tests.test_diffusion_2d import _solve

    e_auto, _ = _solve(
        lt.OperatorEvaluationStrategy.MATRIX_FREE,
        lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=4000), precond=lt.Jacobi()),
        order=3,
        n=4,
    )
    assert np.linalg.norm(e_auto) < 1e-8
