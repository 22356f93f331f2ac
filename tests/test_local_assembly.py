"""Local LSFEM assembly oracles.

Mirrors ``tests/LocalAssemblyTests.cpp`` / ``tests/LocalOperatorTests.cpp``:
analytic mass/stiffness matrices, assembled-vs-matrix-free consistency,
boundary geometry.
"""

import jax.numpy as jnp
import numpy as np

from l3ster_tpu.algsys.local import (
    _basis_stack,
    domain_tables,
    element_geometry,
    eval_equation_kernel,
    local_apply_direct,
    local_diagonal,
    local_rhs,
    local_system,
    side_tables,
)
from l3ster_tpu.common.kernel import KernelParams, wrap_domain_equation_kernel
from l3ster_tpu.mesh.traits import ElementType

UNIT_QUAD = jnp.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]]], dtype=jnp.float64)


def _mass_kernel():
    def fn(inp, out):
        ops, rhs = out
        ops[0][0, 0] = 1.0
        rhs[0] = 1.0

    return wrap_domain_equation_kernel(fn, KernelParams(dimension=2, n_equations=1, n_unknowns=1))


def _grad_kernel():
    def fn(inp, out):
        ops, rhs = out
        ops[1][0, 0] = 1.0
        ops[2][1, 0] = 1.0

    return wrap_domain_equation_kernel(fn, KernelParams(dimension=2, n_equations=2, n_unknowns=1))


def test_mass_matrix_q1():
    tab = domain_tables(ElementType.QUAD, 1, 4)
    geom = element_geometry(tab, UNIT_QUAD)
    K, F = local_system(_mass_kernel(), tab, geom)
    M_exact = np.array([[4, 2, 2, 1], [2, 4, 1, 2], [2, 1, 4, 2], [1, 2, 2, 4]]) / 36.0
    assert np.allclose(np.array(K[0]), M_exact, atol=1e-14)
    assert np.allclose(np.array(F[0]).ravel(), 0.25)


def test_stiffness_matrix_q1():
    tab = domain_tables(ElementType.QUAD, 1, 4)
    geom = element_geometry(tab, UNIT_QUAD)
    K, _ = local_system(_grad_kernel(), tab, geom)
    S = np.array(
        [
            [2 / 3, -1 / 6, -1 / 6, -1 / 3],
            [-1 / 6, 2 / 3, -1 / 3, -1 / 6],
            [-1 / 6, -1 / 3, 2 / 3, -1 / 6],
            [-1 / 3, -1 / 6, -1 / 6, 2 / 3],
        ]
    )
    assert np.allclose(np.array(K[0]), S, atol=1e-14)


def test_qp_chunked_matches_unchunked():
    tab = domain_tables(ElementType.QUAD, 2, 6)
    verts = jnp.array(
        [[[0, 0, 0], [1.2, 0.1, 0], [-0.1, 0.9, 0], [1.0, 1.1, 0]]], dtype=jnp.float64
    )
    geom = element_geometry(tab, verts)
    K, F = local_system(_grad_kernel(), tab, geom)
    Kc, Fc = local_system(_grad_kernel(), tab, geom, qp_chunk=5)
    assert np.allclose(Kc, K, atol=1e-13)
    assert np.allclose(Fc, F, atol=1e-13)


def test_matrix_free_apply_matches_assembled():
    tab = domain_tables(ElementType.QUAD, 2, 6)
    rng = np.random.default_rng(3)
    verts = jnp.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
            [[1, 0, 0], [2.2, -0.1, 0], [1, 1, 0], [2.1, 1.2, 0]],
        ],
        dtype=jnp.float64,
    )
    geom = element_geometry(tab, verts)
    kern = _grad_kernel()
    K, _ = local_system(kern, tab, geom)
    A, f = eval_equation_kernel(kern, geom)
    B = _basis_stack(tab, geom, jnp.float64)
    x = jnp.asarray(rng.normal(size=(2, 9, 1)))
    y_mf = local_apply_direct(A, B, geom.weights, x)
    for e in range(2):
        y_ref = (K[e] @ x[e].reshape(-1)).reshape(9, 1)
        assert np.allclose(y_mf[e], y_ref, atol=1e-12)
    d = local_diagonal(A, B, geom.weights)
    for e in range(2):
        assert np.allclose(d[e].ravel(), np.diag(np.array(K[e])), atol=1e-12)


def test_boundary_normals_and_measure():
    tab1 = side_tables(ElementType.QUAD, 1, 1, 4)  # x = +1
    geom = element_geometry(tab1, UNIT_QUAD)
    assert np.allclose(geom.normals[0], [1.0, 0.0])
    assert np.allclose(np.sum(geom.weights[0]), 1.0)
    tab2 = side_tables(ElementType.QUAD, 1, 2, 4)  # y = -1
    geom2 = element_geometry(tab2, UNIT_QUAD)
    assert np.allclose(geom2.normals[0], [0.0, -1.0])

    # distorted element: normal of the right side of a trapezoid
    verts = jnp.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 1, 0]]], dtype=jnp.float64)
    geom3 = element_geometry(tab1, verts)
    # side from (1,0) to (2,1): outward normal (1,-1)/sqrt(2), length sqrt(2)
    expect = np.array([1.0, -1.0]) / np.sqrt(2)
    assert np.allclose(geom3.normals[0], expect, atol=1e-12)
    assert np.allclose(np.sum(geom3.weights[0]), np.sqrt(2.0), atol=1e-12)


def test_hex_mass_total():
    # integral of 1 over a stretched hex = volume
    tab = domain_tables(ElementType.HEX, 1, 2)
    verts = np.zeros((1, 8, 3))
    verts[0] = np.array(
        [[0, 0, 0], [2, 0, 0], [0, 3, 0], [2, 3, 0], [0, 0, 4], [2, 0, 4], [0, 3, 4], [2, 3, 4]]
    )
    geom = element_geometry(tab, jnp.asarray(verts))
    K, _ = local_system(_mass_kernel_3d(), tab, geom)
    assert np.allclose(np.sum(np.array(K[0])), 24.0, atol=1e-12)


def _mass_kernel_3d():
    def fn(inp, out):
        ops, rhs = out
        ops[0][0, 0] = 1.0

    return wrap_domain_equation_kernel(fn, KernelParams(dimension=3, n_equations=1, n_unknowns=1))
