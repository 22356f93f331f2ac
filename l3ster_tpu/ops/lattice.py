"""Gather-free element access on structured node lattices.

TPU gathers are overhead-bound: moving the (E, n_nodes) node rows of a p=6
hex mesh costs ~1ms although it is only ~1MB of data.  When the mesh block is
a structured tensor-product lattice (every generated Cube/Square mesh, and
each structured sub-block of composite meshes), the element gather is a
strided WINDOW extraction -- expressible purely with slices, reshapes, and
concats, which XLA lowers to copies at full HBM bandwidth.  The transpose
(scatter-add) is the matching overlap-add, also gather-free.

Window structure along one axis of length n1 = ne*p + 1 (ne elements of
order p sharing endpoints):

    window e = [e*p, e*p + p]   (p+1 nodes, consecutive, stride-p origins)

so the (ne, p+1) windows are the contiguous run ``t[:ne*p]`` reshaped to
(ne, p) plus the closing nodes ``t[p::p]`` -- two slices, no gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["detect_lattice_plan", "lattice_gather", "lattice_scatter_add"]


def detect_lattice_plan(row_idx: np.ndarray, n_rows: int, order: int, dim: int):
    """(n1, ne, eidx, inv_eidx) if row_idx is a full tensor-product lattice.

    row_idx (E, n_nodes) node-row ids with local node = i + n*j [+ n^2*k],
    x fastest.  ``eidx`` maps block element -> canonical (x-fastest) element
    index (None when they coincide); verified exactly against a predicted
    index array, otherwise None.
    """
    E, n_nodes = row_idx.shape
    n = order + 1
    p = order
    if n_nodes != n**dim or E == 0:
        return None
    row_idx = row_idx.astype(np.int64)
    base = row_idx[:, 0]
    if n > 1 and int(row_idx[0, 1]) - int(base[0]) != 1:
        return None
    n1x = int(row_idx[0, n]) - int(base[0])
    if n1x <= 0:
        return None
    if dim == 3:
        sz = int(row_idx[0, n * n]) - int(base[0])
        if sz <= 0 or sz % n1x or n_rows % sz:
            return None
        n1 = (n1x, sz // n1x, n_rows // sz)
    else:
        if n_rows % n1x:
            return None
        n1 = (n1x, n_rows // n1x)
    ne = tuple((a - 1) // p if (a - 1) % p == 0 and a > 1 else -1 for a in n1)
    if any(a < 1 for a in ne) or int(np.prod(ne)) != E:
        return None
    # element grid coordinates from the window origins
    ix = base % n1[0]
    rest = base // n1[0]
    iy = rest % n1[1] if dim == 3 else rest
    iz = rest // n1[1] if dim == 3 else np.zeros_like(base)
    if ((ix % p) != 0).any() or ((iy % p) != 0).any() or ((iz % p) != 0).any():
        return None
    ex, ey, ez = ix // p, iy // p, iz // p
    if (ex >= ne[0]).any() or (ey >= ne[1]).any() or (dim == 3 and (ez >= ne[2]).any()):
        return None
    eidx = ex + ne[0] * (ey + (ne[1] * ez if dim == 3 else 0))  # canonical x-fastest
    if len(np.unique(eidx)) != E:
        return None
    # exact verification: base + in-window offsets must reproduce row_idx
    i_ = np.arange(n)
    if dim == 2:
        offs = (i_[None, :] + n1[0] * i_[:, None]).reshape(-1)  # (n*n,) node lex order
    else:
        offs = (
            i_[None, None, :] + n1[0] * i_[None, :, None] + n1[0] * n1[1] * i_[:, None, None]
        ).reshape(-1)
    if not np.array_equal(base[:, None] + offs[None, :], row_idx):
        return None
    if np.array_equal(eidx, np.arange(E)):
        return n1, ne, None, None
    inv = np.empty(E, dtype=np.int64)
    inv[eidx] = np.arange(E)
    return n1, ne, eidx.astype(np.int32), inv.astype(np.int32)


def _window0(t: jnp.ndarray, ne: int, p: int) -> jnp.ndarray:
    """Axis-0 window extraction: t (ne*p+1, ...) -> (ne, p+1, ...)."""
    base = t[: ne * p].reshape((ne, p) + t.shape[1:])
    close = t[p::p][:, None]  # (ne, 1, ...)
    return jnp.concatenate([base, close], axis=1)


def _unwindow0(w: jnp.ndarray, ne: int, p: int) -> jnp.ndarray:
    """Axis-0 overlap-add, exact transpose of :func:`_window0`.

    w (ne, p+1, ...) -> t (ne*p+1, ...): windows share endpoints, so the
    closing node of window e adds onto the opening node of window e+1.
    """
    base, close = w[:, :p], w[:, p]  # (ne, p, ...), (ne, ...)
    first = base[:1, :1]  # window 0 opening node: no incoming overlap
    rest0 = base[1:, :1] + close[:-1][:, None]  # opening nodes of windows 1..
    col0 = jnp.concatenate([first, rest0], axis=0)  # (ne, 1, ...)
    body = jnp.concatenate([col0, base[:, 1:]], axis=1).reshape((ne * p,) + w.shape[2:])
    return jnp.concatenate([body, close[-1:]], axis=0)  # (+ final closing node)


def lattice_gather(x: jnp.ndarray, plan, order: int) -> jnp.ndarray:
    """x (n_rows, c) -> x_loc (E, n_nodes, c) via pure slicing (no node gather).

    Canonical element order is x-fastest; a non-canonical block element order
    costs one coarse E-row permutation gather (rows of n_nodes*c -- overhead
    amortizes over the large rows, unlike node gathers).
    """
    n1, ne, eidx, _ = plan
    p = order
    n = p + 1
    c = x.shape[-1]
    dim = len(n1)
    if dim == 2:
        t = x.reshape(n1[1], n1[0], c)
        t = _window0(t, ne[1], p)  # (ney, nj, n1x, c)
        t = jnp.moveaxis(_window0(jnp.moveaxis(t, 2, 0), ne[0], p), (0, 1), (2, 3))
        # (ney, nj, nex, ni, c) -> (ney, nex, nj, ni, c)
        t = jnp.transpose(t, (0, 2, 1, 3, 4))
        out = t.reshape(ne[0] * ne[1], n * n, c)
    else:
        t = x.reshape(n1[2], n1[1], n1[0], c)
        t = _window0(t, ne[2], p)  # (nez, nk, n1y, n1x, c)
        t = jnp.moveaxis(_window0(jnp.moveaxis(t, 2, 0), ne[1], p), (0, 1), (2, 3))
        # (nez, nk, ney, nj, n1x, c)
        t = jnp.moveaxis(_window0(jnp.moveaxis(t, 4, 0), ne[0], p), (0, 1), (4, 5))
        # (nez, nk, ney, nj, nex, ni, c) -> (nez, ney, nex, nk, nj, ni, c)
        t = jnp.transpose(t, (0, 2, 4, 1, 3, 5, 6))
        out = t.reshape(ne[0] * ne[1] * ne[2], n**3, c)
    return out if eidx is None else out[eidx]


def lattice_scatter_add(y_loc: jnp.ndarray, plan, order: int) -> jnp.ndarray:
    """Exact transpose of :func:`lattice_gather`: (E, n_nodes, c) -> (n_rows, c)."""
    n1, ne, _, inv_eidx = plan
    p = order
    n = p + 1
    c = y_loc.shape[-1]
    dim = len(n1)
    if inv_eidx is not None:
        y_loc = y_loc[inv_eidx]
    if dim == 2:
        t = y_loc.reshape(ne[1], ne[0], n, n, c)
        t = jnp.transpose(t, (0, 2, 1, 3, 4))  # (ney, nj, nex, ni, c)
        t = jnp.moveaxis(_unwindow0(jnp.moveaxis(t, (2, 3), (0, 1)), ne[0], p), 0, 2)
        # (ney, nj, n1x, c)
        t = _unwindow0(t, ne[1], p)  # (n1y, n1x, c)
        return t.reshape(n1[0] * n1[1], c)
    t = y_loc.reshape(ne[2], ne[1], ne[0], n, n, n, c)
    t = jnp.transpose(t, (0, 3, 1, 4, 2, 5, 6))  # (nez, nk, ney, nj, nex, ni, c)
    t = jnp.moveaxis(_unwindow0(jnp.moveaxis(t, (4, 5), (0, 1)), ne[0], p), 0, 4)
    # (nez, nk, ney, nj, n1x, c)
    t = jnp.moveaxis(_unwindow0(jnp.moveaxis(t, (2, 3), (0, 1)), ne[1], p), 0, 2)
    # (nez, nk, n1y, n1x, c)
    t = _unwindow0(t, ne[2], p)  # (n1z, n1y, n1x, c)
    return t.reshape(n1[0] * n1[1] * n1[2], c)
