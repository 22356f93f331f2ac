"""Built-in structured mesh generators.

Analogs of ``mesh/primitives/``: line / square / cube meshes at order 1 with
the same domain/boundary-id conventions as the reference
(``SquareMesh.hpp:8-11``: domain=0, bottom=1, top=2, left=3, right=4;
``CubeMesh.hpp:8-11``: domain=0, back=1, front=2, bottom=3, top=4, left=5,
right=6).  All connectivity is vectorized numpy; node ids are lexicographic
(x fastest), matching the reference generators' numbering.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .core import ElementBlock, Mesh
from .traits import ElementType

__all__ = [
    "SquareMeshIds",
    "CubeMeshIds",
    "make_line_mesh",
    "make_square_mesh",
    "make_cube_mesh",
]


@dataclass(frozen=True)
class SquareMeshIds:
    domain: int = 0
    bottom: int = 1
    top: int = 2
    left: int = 3
    right: int = 4


@dataclass(frozen=True)
class CubeMeshIds:
    domain: int = 0
    back: int = 1
    front: int = 2
    bottom: int = 3
    top: int = 4
    left: int = 5
    right: int = 6


def _as_dist(d) -> np.ndarray:
    d = np.asarray(d, dtype=np.float64)
    if d.ndim != 1 or len(d) < 2:
        raise ValueError("node distribution must be a 1D array of at least 2 points")
    return d


def make_line_mesh(distx, domain_id: int = 0, left_id: int | None = None, right_id: int | None = None) -> Mesh:
    """1D line mesh.  Unlike the reference (which has no 0D boundary elements),
    optional left/right boundary ids are not supported and kept for signature parity."""
    distx = _as_dist(distx)
    ne = len(distx) - 1
    nodes = np.stack([np.arange(ne), np.arange(1, ne + 1)], axis=1).astype(np.int64)
    verts = np.zeros((ne, 2, 3))
    verts[:, 0, 0] = distx[:-1]
    verts[:, 1, 0] = distx[1:]
    coords = np.zeros((ne + 1, 3))
    coords[:, 0] = distx
    blk = ElementBlock(ElementType.LINE, 1, nodes, verts)
    return Mesh(dim=1, n_nodes=ne + 1, node_coords=coords, domains={domain_id: [blk]})


def make_square_mesh(distx, disty=None, ids: SquareMeshIds = SquareMeshIds()) -> Mesh:
    """Unit-square-style structured quad mesh with 4 line boundaries."""
    distx = _as_dist(distx)
    disty = distx if disty is None else _as_dist(disty)
    nx, ny = len(distx), len(disty)
    ex, ey = nx - 1, ny - 1

    # Global node ids: iy * nx + ix (x fastest), like the reference generator
    X, Y = np.meshgrid(distx, disty, indexing="xy")  # shape (ny, nx)
    coords = np.zeros((nx * ny, 3))
    coords[:, 0] = X.reshape(-1)
    coords[:, 1] = Y.reshape(-1)

    ix, iy = np.meshgrid(np.arange(ex), np.arange(ey), indexing="xy")
    ix, iy = ix.reshape(-1), iy.reshape(-1)
    base = iy * nx + ix
    qnodes = np.stack([base, base + 1, base + nx, base + nx + 1], axis=1).astype(np.int64)
    qverts = np.zeros((ex * ey, 4, 3))
    qverts[:, 0, 0], qverts[:, 0, 1] = distx[ix], disty[iy]
    qverts[:, 1, 0], qverts[:, 1, 1] = distx[ix + 1], disty[iy]
    qverts[:, 2, 0], qverts[:, 2, 1] = distx[ix], disty[iy + 1]
    qverts[:, 3, 0], qverts[:, 3, 1] = distx[ix + 1], disty[iy + 1]

    def line_block(node_ids: np.ndarray) -> ElementBlock:
        nodes = np.stack([node_ids[:-1], node_ids[1:]], axis=1).astype(np.int64)
        verts = np.zeros((len(node_ids) - 1, 2, 3))
        verts[:, 0, :] = coords[node_ids[:-1]]
        verts[:, 1, :] = coords[node_ids[1:]]
        return ElementBlock(ElementType.LINE, 1, nodes, verts)

    bottom = line_block(np.arange(nx))
    top = line_block(np.arange(nx) + ey * nx)
    left = line_block(np.arange(ny) * nx)
    right = line_block(np.arange(ny) * nx + ex)

    domains = {
        ids.domain: [ElementBlock(ElementType.QUAD, 1, qnodes, qverts)],
        ids.bottom: [bottom],
        ids.top: [top],
        ids.left: [left],
        ids.right: [right],
    }
    return Mesh(
        dim=2,
        n_nodes=nx * ny,
        node_coords=coords,
        domains=domains,
        boundary_ids=(ids.bottom, ids.top, ids.left, ids.right),
    )


def make_cube_mesh(distx, disty=None, distz=None, ids: CubeMeshIds = CubeMeshIds()) -> Mesh:
    """Structured hex mesh with 6 quad boundaries (back/front = z-/z+,
    bottom/top = y-/y+, left/right = x-/x+, matching CubeMesh.hpp:10)."""
    distx = _as_dist(distx)
    disty = distx if disty is None else _as_dist(disty)
    distz = distx if distz is None else _as_dist(distz)
    nx, ny, nz = len(distx), len(disty), len(distz)
    ex, ey, ez = nx - 1, ny - 1, nz - 1

    gx, gy, gz = np.meshgrid(distx, disty, distz, indexing="ij")
    # node id = iz*nx*ny + iy*nx + ix
    nid = lambda ix, iy, iz: iz * nx * ny + iy * nx + ix
    coords = np.zeros((nx * ny * nz, 3))
    IX, IY, IZ = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    coords[nid(IX, IY, IZ).reshape(-1), 0] = gx.reshape(-1)
    coords[nid(IX, IY, IZ).reshape(-1), 1] = gy.reshape(-1)
    coords[nid(IX, IY, IZ).reshape(-1), 2] = gz.reshape(-1)

    ix, iy, iz = np.meshgrid(np.arange(ex), np.arange(ey), np.arange(ez), indexing="ij")
    ix, iy, iz = ix.reshape(-1), iy.reshape(-1), iz.reshape(-1)
    offs = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0), (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
    hnodes = np.stack([nid(ix + a, iy + b, iz + c) for a, b, c in offs], axis=1).astype(np.int64)
    hverts = coords[hnodes]

    def quad_block(corner_ids: np.ndarray) -> ElementBlock:
        # corner_ids: (n_face, 4) global node ids in local lexicographic order
        verts = coords[corner_ids]
        return ElementBlock(ElementType.QUAD, 1, corner_ids.astype(np.int64), verts)

    def face_ids(fixed_axis: int, fixed_val: int) -> np.ndarray:
        axes = [a for a in range(3) if a != fixed_axis]
        na = [ex, ey, ez][axes[0]]
        nb = [ex, ey, ez][axes[1]]
        A, B = np.meshgrid(np.arange(na), np.arange(nb), indexing="xy")
        A, B = A.reshape(-1), B.reshape(-1)

        def make(a, b):
            c = [0, 0, 0]
            c[axes[0]], c[axes[1]], c[fixed_axis] = a, b, fixed_val
            return nid(c[0], c[1], c[2])

        return np.stack([make(A, B), make(A + 1, B), make(A, B + 1), make(A + 1, B + 1)], axis=1)

    domains = {
        ids.domain: [ElementBlock(ElementType.HEX, 1, hnodes, hverts)],
        ids.back: [quad_block(face_ids(2, 0))],
        ids.front: [quad_block(face_ids(2, nz - 1))],
        ids.bottom: [quad_block(face_ids(1, 0))],
        ids.top: [quad_block(face_ids(1, ny - 1))],
        ids.left: [quad_block(face_ids(0, 0))],
        ids.right: [quad_block(face_ids(0, nx - 1))],
    }
    return Mesh(
        dim=3,
        n_nodes=nx * ny * nz,
        node_coords=coords,
        domains=domains,
        boundary_ids=(ids.back, ids.front, ids.bottom, ids.top, ids.left, ids.right),
    )
