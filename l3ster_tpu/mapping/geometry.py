"""Reference-to-physical geometric mapping.

Analog of ``mapping/JacobiMat.hpp`` / ``mapping/MapReferenceToPhysical.hpp`` /
``mapping/ComputePhysBasisDer.hpp`` / ``mapping/BoundaryNormal.hpp``.  The
geometric map is order-1 (multilinear from the corner vertices, matching
``mesh/ElementData.hpp``); its shape-function tables at the evaluation points
are static numpy constants, while the per-element Jacobian algebra is traced
jnp, vmapped over elements.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..basis.tables import basis_at_points
from ..mesh.traits import ElementType, native_dim, side_axis_sign

__all__ = [
    "corner_map_tables",
    "jacobians",
    "map_to_physical",
    "physical_basis_derivatives",
    "boundary_normals_and_measure",
]


@lru_cache(maxsize=None)
def corner_map_tables(et: ElementType, pts_key) -> tuple[np.ndarray, np.ndarray]:
    """(N1, dN1) of the order-1 geometric map at the given points.

    ``pts_key`` is a hashable (bytes, shape) snapshot; use the helper below.
    """
    raw, shape = pts_key
    pts = np.frombuffer(raw, dtype=np.float64).reshape(shape)
    b = basis_at_points(et, 1, pts)
    return b.values, b.derivatives  # (n_pts, n_verts), (n_pts, dim, n_verts)


def _pts_key(pts: np.ndarray):
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    return (pts.tobytes(), pts.shape)


def geometry_tables(et: ElementType, pts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Corner-map values/derivatives at reference points (cached)."""
    return corner_map_tables(et, _pts_key(pts))


def jacobians(dN1: np.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """J[q, i, j] = dx_i/dxi_j at each point; verts (n_verts, dim).

    Full-f32 precision is REQUIRED on TPU: J entries are O(h) sums of O(1)
    coordinate products, so the default bf16 MXU pass loses the leading
    digits to cancellation — at h ~ 1e-2 the relative error reaches percents
    and every downstream operator table inherits it (measured: p1-on-GLL
    level operators 1.3% wrong at 13^3, worse as h shrinks).
    """
    import jax

    return jnp.einsum("qjv,vi->qij", dN1, verts, precision=jax.lax.Precision.HIGHEST)


def small_det(J: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., d, d) matrices, d <= 3, without LU (TPU-safe f64)."""
    d = J.shape[-1]
    if d == 1:
        return J[..., 0, 0]
    if d == 2:
        return J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    if d == 3:
        return (
            J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1])
            - J[..., 0, 1] * (J[..., 1, 0] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 0])
            + J[..., 0, 2] * (J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0])
        )
    raise ValueError(f"small_det supports d <= 3, got {d}")


def small_inv(J: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., d, d) matrices, d <= 3, via cofactors (TPU-safe f64)."""
    d = J.shape[-1]
    det = small_det(J)[..., None, None]
    if d == 1:
        return 1.0 / J
    if d == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, e = J[..., 1, 0], J[..., 1, 1]
        adj = jnp.stack(
            [jnp.stack([e, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
        )
        return adj / det
    if d == 3:
        m = lambda i, j: J[..., i, j]
        cof = [
            [
                m(1, 1) * m(2, 2) - m(1, 2) * m(2, 1),
                m(0, 2) * m(2, 1) - m(0, 1) * m(2, 2),
                m(0, 1) * m(1, 2) - m(0, 2) * m(1, 1),
            ],
            [
                m(1, 2) * m(2, 0) - m(1, 0) * m(2, 2),
                m(0, 0) * m(2, 2) - m(0, 2) * m(2, 0),
                m(0, 2) * m(1, 0) - m(0, 0) * m(1, 2),
            ],
            [
                m(1, 0) * m(2, 1) - m(1, 1) * m(2, 0),
                m(0, 1) * m(2, 0) - m(0, 0) * m(2, 1),
                m(0, 0) * m(1, 1) - m(0, 1) * m(1, 0),
            ],
        ]
        adj = jnp.stack([jnp.stack(row, axis=-1) for row in cof], axis=-2)
        return adj / det
    raise ValueError(f"small_inv supports d <= 3, got {d}")


def map_to_physical(N1: np.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """Physical coordinates of the reference points; (n_pts, dim)."""
    return jnp.einsum("qv,vi->qi", N1, verts)


def physical_basis_derivatives(J: jnp.ndarray, ref_ders: np.ndarray) -> jnp.ndarray:
    """dN/dx[q, i, n] from reference derivatives via J^{-T}.

    ref_ders: (n_qp, dim, n_nodes) static.  Returns (n_qp, dim, n_nodes).
    """
    JinvT = jnp.swapaxes(small_inv(J), -1, -2)
    return jnp.einsum("qij,qjn->qin", JinvT, jnp.asarray(ref_ders, J.dtype))


def boundary_normals_and_measure(
    J: jnp.ndarray, et: ElementType, side: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Outward unit normal (n_qp, dim) and surface measure dA (n_qp,) on a side.

    n = sign * J^{-T} e_axis / |J^{-T} e_axis| (outward by construction);
    dA = sqrt(det(J_s^T J_s)) with J_s the Jacobian restricted to the facet axes.
    """
    dim = native_dim(et)
    axis, sign = side_axis_sign(et, side)
    Jinv = small_inv(J)  # (n_qp, dim, dim)
    n_raw = sign * Jinv[:, axis, :]  # row `axis` of J^{-1} = J^{-T} e_axis
    normal = n_raw / jnp.linalg.norm(n_raw, axis=-1, keepdims=True)
    other_axes = [a for a in range(dim) if a != axis]
    if other_axes:
        Js = J[:, :, other_axes]  # (n_qp, dim, dim-1)
        G = jnp.einsum("qia,qib->qab", Js, Js)
        dA = jnp.sqrt(small_det(G))
    else:
        dA = jnp.ones(J.shape[0], dtype=J.dtype)
    return normal, dA
