"""Evaluation of residual kernels at nodal points.

Analog of ``algsys/ComputeValuesAtNodes.hpp:211-380``: evaluate a (domain or
boundary) residual kernel at the nodes of the selected domains / boundary
views, scatter-add into node arrays with contribution counting, and average at
shared nodes.  Used for Dirichlet BC values, initial conditions, and
``SolutionManager.set_fields_from_kernel``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mesh.core import Mesh
from ..mesh.traits import side_node_indices
from .local import element_geometry, eval_fields, eval_residual_kernel, node_tables, side_tables

__all__ = ["compute_values_at_nodes", "compute_boundary_values_at_nodes"]


def _scatter_average(node_ids_list, vals_list, n_nodes, n_eq, n_rhs, dtype):
    acc = jnp.zeros((n_nodes, n_eq, n_rhs), dtype=dtype)
    cnt = jnp.zeros((n_nodes,), dtype=dtype)
    for node_ids, vals in zip(node_ids_list, vals_list):
        flat = jnp.asarray(node_ids.reshape(-1))
        acc = acc.at[flat].add(vals.reshape(-1, n_eq, n_rhs))
        cnt = cnt.at[flat].add(1.0)
    mask = cnt > 0
    avg = acc / jnp.where(mask, cnt, 1.0)[:, None, None]
    return avg, mask


def compute_values_at_nodes(
    kernel, mesh: Mesh, domain_ids, field_access=None, time=0.0, dtype=jnp.float64
):
    """Domain variant: kernel evaluated at the nodes of each element.

    Returns (values (n_nodes, n_eq, n_rhs), mask (n_nodes,) bool).
    """
    if kernel.is_boundary:
        return compute_boundary_values_at_nodes(kernel, mesh, domain_ids, field_access, time, dtype)
    p = kernel.params
    ids_list, vals_list = [], []
    for _, blk in mesh.blocks(domain_ids):
        tab = node_tables(blk.element_type, blk.order)
        geom = element_geometry(tab, jnp.asarray(blk.vertices, dtype))
        fv = fd = None
        if field_access is not None:
            fv, fd = eval_fields(tab, geom, field_access.gather(blk.nodes).astype(dtype))
        vals = eval_residual_kernel(kernel, geom, fv, fd, time, dtype)  # (E, n_nodes, n_eq, n_rhs)
        ids_list.append(blk.nodes)
        vals_list.append(vals)
    if not ids_list:
        raise ValueError(f"no elements found in domains {list(domain_ids)}")
    return _scatter_average(ids_list, vals_list, mesh.n_nodes, p.n_equations, p.n_rhs, dtype)


def compute_boundary_values_at_nodes(
    kernel, mesh: Mesh, boundary_ids, field_access=None, time=0.0, dtype=jnp.float64
):
    """Boundary variant: kernel evaluated at the nodes lying on each side,
    with outward normals from the parent element map."""
    p = kernel.params
    ids_list, vals_list = [], []
    for bid in boundary_ids:
        views = mesh.boundary_views.get(bid)
        if views is None:
            raise ValueError(f"domain {bid} is not a boundary of the mesh")
        for bv in views:
            blk = bv.parent_block
            sn = side_node_indices(blk.element_type, blk.order, bv.side)
            tab = _side_node_tables(blk.element_type, blk.order, bv.side)
            verts = jnp.asarray(blk.vertices[bv.element_indices], dtype)
            geom = element_geometry(tab, verts)
            fv = fd = None
            if field_access is not None:
                nodal = field_access.gather(blk.nodes[bv.element_indices]).astype(dtype)
                fv, fd = eval_fields(tab, geom, nodal)
            vals = eval_residual_kernel(kernel, geom, fv, fd, time, dtype)
            ids_list.append(blk.nodes[bv.element_indices][:, sn])
            vals_list.append(vals)
    if not ids_list:
        raise ValueError(f"no boundary facets found in {list(boundary_ids)}")
    return _scatter_average(ids_list, vals_list, mesh.n_nodes, p.n_equations, p.n_rhs, dtype)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _side_node_tables(et, order, side):
    """Basis tables of the FULL element at the nodal points of one side,
    marked as boundary tables so normals are produced."""
    from ..basis.tables import basis_at_points
    from ..mapping.geometry import geometry_tables
    from ..mesh.traits import reference_node_coords
    from .local import DomainTables

    sn = side_node_indices(et, order, side)
    pts = reference_node_coords(et, order)[sn]
    b = basis_at_points(et, order, pts)
    gv, gd = geometry_tables(et, pts)
    w = np.ones(len(sn))
    return DomainTables(et, order, b.values, b.derivatives, w, pts, gv, gd, side=side)
