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

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "detect_lattice_plan",
    "lattice_gather",
    "lattice_scatter_add",
    "detect_face_plan",
    "face_gather",
    "face_scatter_pad",
    "face_gather_tensor",
    "face_scatter_tensor_add",
]


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
    if dim == 1:
        out = _window0(x.reshape(n1[0], c), ne[0], p)  # (ne, n, c)
        return out if eidx is None else out[eidx]
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


def detect_face_plan(vol_plan, order: int, dim: int, side: int, elem_sel, ns, n_nodes: int):
    """Slicing plan for a boundary bucket that covers one FULL side of a
    lattice block, restricted to the side's surface nodes.

    With lattice node numbering the side's surface nodes are one lattice
    plane (a (dim-1)-lattice), so the per-element boundary gather/scatter —
    the dominant cost of boundary contributions on TPU (per-row overhead) —
    becomes a static plane slice + (dim-1)D window extraction.

    Returns dict(axis, hi, n1, plan2d) or None when the bucket is not a full
    canonical side (fallback to the gather path).
    """
    n1, ne, eidx, _ = vol_plan
    p = order
    n = p + 1
    axis, hi = side // 2, side % 2
    # ns must be exactly the side's surface nodes, ascending local ids
    lat = np.arange(n_nodes)
    if dim == 3:
        coords = (lat % n, (lat // n) % n, lat // (n * n))
    else:
        coords = (lat % n, lat // n)
    pred = np.nonzero(coords[axis] == (p if hi else 0))[0]
    if ns is None or not np.array_equal(np.asarray(ns), pred):
        return None
    sel = np.asarray(elem_sel, dtype=np.int64)
    can = np.asarray(eidx)[sel] if eidx is not None else sel
    ex = can % ne[0]
    rest = can // ne[0]
    ecoords = (ex, rest % ne[1], rest // ne[1]) if dim == 3 else (ex, rest)
    if not (ecoords[axis] == (ne[axis] - 1 if hi else 0)).all():
        return None
    rem = [a for a in range(dim) if a != axis]
    ne2 = tuple(int(ne[a]) for a in rem)
    n12 = tuple(int(n1[a]) for a in rem)
    E = len(sel)
    if E != int(np.prod(ne2)):
        return None
    fcan = ecoords[rem[0]] + (ne2[0] * ecoords[rem[1]] if dim == 3 else 0)
    if len(np.unique(fcan)) != E:
        return None
    if np.array_equal(fcan, np.arange(E)):
        feidx = finv = None
    else:
        feidx = fcan.astype(np.int32)
        finv = np.empty(E, dtype=np.int64)
        finv[fcan] = np.arange(E)
        finv = finv.astype(np.int32)
    return dict(
        axis=axis,
        hi=bool(hi),
        n1=tuple(int(a) for a in n1),
        plan2d=(n12, ne2, feidx, finv),
    )


def face_gather(x: jnp.ndarray, fp: dict, order: int) -> jnp.ndarray:
    """x (n_rows, c) -> x_loc (E_face, n_surface_nodes, c): plane slice +
    (dim-1)D window extraction, no gathers.

    Channel-LEADING internals: a (nz, ny, nx, c) view with c minor carries
    ~32x lane padding on TPU (c=4 of 128 lanes), making plane slices cost
    full-tensor-scale relayouts; (c, nz, ny, nx) keeps the minor dim a
    lattice axis, and only the tiny extracted plane is re-transposed."""
    n1, axis = fp["n1"], fp["axis"]
    c = x.shape[-1]
    dim = len(n1)
    t = x.T.reshape((c,) + tuple(reversed(n1)))
    pos = 1 + (dim - 1 - axis)  # axis position in the (c, z, y, x) layout
    idx = fp.get("plane", n1[axis] - 1 if fp["hi"] else 0)
    # dynamic_index_in_dim: the plane index may be a traced per-shard value
    # (window-decomposed BoxSystem); static ints lower identically
    plane = jax.lax.dynamic_index_in_dim(t, idx, axis=pos, keepdims=False)
    plane = jnp.moveaxis(plane, 0, -1)
    return lattice_gather(plane.reshape(-1, c), fp["plan2d"], order)


def face_scatter_pad(y_loc: jnp.ndarray, fp: dict, order: int) -> jnp.ndarray:
    """Exact transpose of :func:`face_gather`, padded back to (n_rows, c):
    (dim-1)D overlap-add + static plane insert (no scatter)."""
    n1, axis = fp["n1"], fp["axis"]
    c = y_loc.shape[-1]
    dim = len(n1)
    n12 = fp["plan2d"][0]
    plane = lattice_scatter_add(y_loc, fp["plan2d"], order)
    plane = plane.reshape(tuple(reversed(n12)) + (c,))
    plane = jnp.moveaxis(plane, -1, 0)  # (c, ...) — channel-leading full tensor
    pos = 1 + (dim - 1 - axis)
    idx = fp.get("plane", n1[axis] - 1 if fp["hi"] else 0)
    full = jnp.zeros((c,) + tuple(reversed(n1)), y_loc.dtype)
    key = tuple(slice(None) for _ in range(pos)) + (idx,)
    full = full.at[key].set(plane)
    return full.reshape(c, -1).T


def face_gather_tensor(t: jnp.ndarray, fp: dict, order: int) -> jnp.ndarray:
    """Like :func:`face_gather` but on the channel-leading lattice tensor
    t (c, n1_d, ..., n1_x) directly — used by the fused lattice-group apply
    (``algsys/system.py raw_parts``) so the four boundary faces of a lattice
    block share ONE entry transpose with the volume sweep instead of paying a
    full-tensor relayout each."""
    n1, axis = fp["n1"], fp["axis"]
    c = t.shape[0]
    dim = len(n1)
    pos = 1 + (dim - 1 - axis)  # axis position in the (c, z, y, x) layout
    idx = fp.get("plane", n1[axis] - 1 if fp["hi"] else 0)
    plane = jax.lax.dynamic_index_in_dim(t, idx, axis=pos, keepdims=False)
    plane = jnp.moveaxis(plane, 0, -1)
    return lattice_gather(plane.reshape(-1, c), fp["plan2d"], order)


def face_scatter_tensor_add(y_loc: jnp.ndarray, fp: dict, order: int, acc: jnp.ndarray):
    """Exact transpose of :func:`face_gather_tensor`, accumulated into the
    channel-leading lattice tensor ``acc`` (c, n1_d, ..., n1_x): the face
    result touches only its plane, so no full-size zero-pad / transpose /
    add round-trips HBM (the dominant cost of boundary contributions at the
    flagship before this path existed)."""
    n1, axis = fp["n1"], fp["axis"]
    c = y_loc.shape[-1]
    dim = len(n1)
    n12 = fp["plan2d"][0]
    plane = lattice_scatter_add(y_loc, fp["plan2d"], order)
    plane = plane.reshape(tuple(reversed(n12)) + (c,))
    plane = jnp.moveaxis(plane, -1, 0)  # (c, ...)
    pos = 1 + (dim - 1 - axis)
    idx = fp.get("plane", n1[axis] - 1 if fp["hi"] else 0)
    key = tuple(slice(None) for _ in range(pos)) + (idx,)
    return acc.at[key].add(plane)


def lattice_scatter_add(y_loc: jnp.ndarray, plan, order: int) -> jnp.ndarray:
    """Exact transpose of :func:`lattice_gather`: (E, n_nodes, c) -> (n_rows, c)."""
    n1, ne, _, inv_eidx = plan
    p = order
    n = p + 1
    c = y_loc.shape[-1]
    dim = len(n1)
    if inv_eidx is not None:
        y_loc = y_loc[inv_eidx]
    if dim == 1:
        return _unwindow0(y_loc, ne[0], p)
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
