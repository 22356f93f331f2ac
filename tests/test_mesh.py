"""Mesh-layer tests: traits, generators, order conversion, boundary views.

Mirrors the reference's ``tests/MeshTests.cpp``.
"""

import numpy as np

from l3ster_tpu.basis.tables import basis_at_points, basis_at_quadrature
from l3ster_tpu.mesh.convert_order import convert_mesh_to_order
from l3ster_tpu.mesh.generators import make_cube_mesh, make_line_mesh, make_square_mesh
from l3ster_tpu.mesh.traits import (
    ElementType,
    corner_lattice_indices,
    n_nodes,
    node_lattice,
    reference_node_coords,
    side_node_indices,
)


def test_lattice_ordering():
    lat = node_lattice(ElementType.QUAD, 2)
    assert lat.tolist() == [
        [0, 0], [1, 0], [2, 0],
        [0, 1], [1, 1], [2, 1],
        [0, 2], [1, 2], [2, 2],
    ]
    assert corner_lattice_indices(ElementType.QUAD, 2).tolist() == [0, 2, 6, 8]
    assert n_nodes(ElementType.HEX, 4) == 125


def test_side_node_indices():
    # Quad p=2: side 0 (x=-1): nodes ordered by y
    assert side_node_indices(ElementType.QUAD, 2, 0).tolist() == [0, 3, 6]
    assert side_node_indices(ElementType.QUAD, 2, 1).tolist() == [2, 5, 8]
    assert side_node_indices(ElementType.QUAD, 2, 2).tolist() == [0, 1, 2]
    assert side_node_indices(ElementType.QUAD, 2, 3).tolist() == [6, 7, 8]
    # Hex p=1: side 4 (z=-1) in facet lex order (x fastest, then y)
    assert side_node_indices(ElementType.HEX, 1, 4).tolist() == [0, 1, 2, 3]
    assert side_node_indices(ElementType.HEX, 1, 5).tolist() == [4, 5, 6, 7]


def test_basis_partition_of_unity():
    for et, p in [(ElementType.LINE, 4), (ElementType.QUAD, 3), (ElementType.HEX, 2)]:
        b = basis_at_quadrature(et, p, 2 * p)
        assert np.allclose(b.values.sum(1), 1.0, atol=1e-12)
        assert np.allclose(b.derivatives.sum(2), 0.0, atol=1e-12)


def test_basis_polynomial_reproduction():
    b = basis_at_quadrature(ElementType.HEX, 3, 6)
    nc = reference_node_coords(ElementType.HEX, 3)
    f = nc[:, 0] ** 3 * nc[:, 1] ** 2
    pq = b.points
    assert np.allclose(b.values @ f, pq[:, 0] ** 3 * pq[:, 1] ** 2, atol=1e-12)
    assert np.allclose(
        b.derivatives[:, 0, :] @ f, 3 * pq[:, 0] ** 2 * pq[:, 1] ** 2, atol=1e-11
    )


def test_square_mesh_structure():
    m = make_square_mesh(np.linspace(0, 1, 5), np.linspace(0, 2, 4))
    assert m.n_nodes == 20 and m.dim == 2
    assert sum(b.n_elements for b in m.domains[0]) == 12
    assert set(m.boundary_views) == {1, 2, 3, 4}
    assert m.boundary_views[1][0].side == 2  # bottom: y = -1
    assert m.boundary_views[4][0].side == 1  # right: x = +1
    assert len(m.boundary_views[1][0].element_indices) == 4


def test_line_mesh():
    m = make_line_mesh(np.linspace(0, 1, 11))
    assert m.n_nodes == 11 and m.dim == 1
    assert m.domains[0][0].n_elements == 10


def test_convert_order_square():
    p = 3
    ex, ey = 4, 3
    m = make_square_mesh(np.linspace(0, 1, ex + 1), np.linspace(0, 2, ey + 1))
    m3 = convert_mesh_to_order(m, p)
    assert m3.n_nodes == (p * ex + 1) * (p * ey + 1)
    # every node position unique (dedup worked, no orphans)
    uc = np.unique(np.round(m3.node_coords, 10), axis=0)
    assert len(uc) == m3.n_nodes
    # nodes at Q1 map of GLL lattice
    blk = m3.domains[0][0]
    W = basis_at_points(ElementType.QUAD, 1, reference_node_coords(ElementType.QUAD, p)).values
    cc = np.einsum("nv,evd->end", W, blk.vertices)
    assert np.allclose(m3.node_coords[blk.nodes], cc, atol=1e-13)
    # boundary facet nodes identical to parent side nodes
    bn = m3.boundary_nodes_of([1])
    assert len(bn) == p * ex + 1
    assert np.allclose(m3.node_coords[bn][:, 1], 0.0)


def test_convert_order_cube():
    m = make_cube_mesh(np.linspace(0, 1, 4))
    m2 = convert_mesh_to_order(m, 2)
    assert m2.n_nodes == 7**3
    uc = np.unique(np.round(m2.node_coords, 10), axis=0)
    assert len(uc) == m2.n_nodes
    assert set(m2.boundary_views) == {1, 2, 3, 4, 5, 6}
    # facet-block nodes must coincide with parent face nodes (shared faces dedup)
    fblk = m2.domains[5][0]
    assert np.array_equal(m2.boundary_nodes_of([5]), np.unique(fblk.nodes))


def test_convert_order_anisotropic_spacing():
    # non-uniform spacing: shared-edge nodes must still agree between neighbors
    m = make_square_mesh(np.array([0.0, 0.3, 1.0]), np.array([0.0, 0.7, 1.5]))
    m4 = convert_mesh_to_order(m, 4)
    blk = m4.domains[0][0]
    # total distinct nodes == lattice count
    assert m4.n_nodes == (4 * 2 + 1) ** 2
    assert np.unique(blk.nodes).size == m4.n_nodes
