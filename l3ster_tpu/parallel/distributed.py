"""Distributed matrix-free system over a TPU device mesh.

TPU-native re-design of the reference's MPI domain decomposition
(``comm/DistributeMesh.hpp``, ``comm/ImportExport.hpp``,
``util/SegmentedOwnership.hpp``): elements are partitioned across a 1D
``jax.sharding.Mesh`` axis, every shard holds a local DOF vector laid out as
``[owned | ghost | dump]`` (padded to a uniform size), and the halo exchange
is ONE static ``lax.all_to_all`` per direction with precomputed pack/unpack
index maps -- the compiled-collective equivalent of the reference's
nonblocking Import/Export engine.  The whole CG iteration runs inside one
jitted ``shard_map`` program, so XLA overlaps the collectives with element
compute (the analog of the reference's interior/border TBB-arena overlap,
``algsys/MatrixFreeSystem.hpp:1019-1140``, which here the compiler schedules).

Solver-facing vectors keep ghosts and the dump slot at exactly zero, so the
generic Krylov dots (plain jnp sums) are correct without ownership masks.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..algsys.local import (
    _basis_stack,
    element_geometry,
    eval_equation_kernel,
    eval_fields,
    local_apply_direct,
    local_apply_sumfact,
    local_diagonal,
    local_rhs,
)
from ..algsys.system import _Contribution, _SystemBase
from ..common.enums import OperatorEvaluationStrategy
from ..common.problem import AlgebraicSystemParams
from .partition import partition_mesh_elements

__all__ = ["DistributedSystem", "make_distributed_system"]


from functools import partial


@partial(jax.jit, static_argnames=("ri",), donate_argnums=(1,))
def _gather_update(x, values, s, l, has, sl, ri: int):
    """One-dispatch solution-manager update: gather each (node, dof) value
    from its owner's slot in the stacked solution and scatter into the
    manager columns (device-side ``ComputeValuesAtNodes``)."""
    vals = jnp.where(has, x[s, l, ri], 0.0)
    return values.at[:, sl].set(vals.astype(values.dtype))


@dataclass
class _ShardBucket:
    """One contribution, stacked across shards (leading axis = shard)."""

    kernel: object
    tables: object
    options: object
    time: float
    verts: np.ndarray  # (P, E_max, n_verts, 3)
    local_idx: np.ndarray  # (P, E_max, n_nodes * n_unk) local dof slots
    shape: tuple  # (n_nodes, n_unk)
    fields: np.ndarray | None  # (P, E_max, n_nodes, n_fields) nodal field values
    mode: str = "both"
    # ELEMENT_BOUNDARY condensation metadata (None when not condensed):
    # dict(block_id, b_sel, i_sel, tb, ti, rows) — ``rows`` is the (P, E_max)
    # map from this bucket's shard-local element slot to the block aggregate
    # row (padding row = aggregate E_max, a discard slot)
    cond: dict | None = None
    # the source _Contribution (global element data + domain/boundary ids):
    # consumed by rediscretizing preconditioners (distributed PMultigrid
    # assembles the SAME kernels at Q1 on the coarse mesh)
    src: object = None


class DistributedSystem(_SystemBase):
    """Matrix-free system sharded over a device mesh axis."""

    def __init__(
        self,
        mesh,
        problem,
        bc_def=None,
        params: AlgebraicSystemParams = AlgebraicSystemParams(),
        n_shards: int | None = None,
        devices=None,
        dtype=None,
        part_fractions=None,
        partition_method: str = "rcb",
        partition_grid: tuple[int, int] | None = None,
    ):
        super().__init__(mesh, problem, bc_def, params, dtype)
        devices = devices if devices is not None else jax.devices()
        self.n_shards = int(n_shards or len(devices))
        if self.n_shards > len(devices):
            raise ValueError(f"requested {self.n_shards} shards but only {len(devices)} devices")
        self.device_mesh = jax.sharding.Mesh(
            np.asarray(devices[: self.n_shards]), ("shards",)
        )
        if partition_grid is not None and partition_method == "rcb":
            partition_method = "rcb2d"
        self.partition_grid = partition_grid
        from ..utils.profiling import profile_region

        with profile_region("distributed/partition"):
            self._parts = partition_mesh_elements(
                mesh, self.n_shards, problem, part_fractions,
                method=partition_method, grid=partition_grid,
            )
        with profile_region("distributed/ownership"):
            self._setup_ownership()
        self._contribs: list[_ShardBucket] = []
        self._diag = None
        self._data = None
        self._asm = None
        self._cond_blocks: dict[int, dict] = {}
        self._cond_YZ: dict[int, tuple] = {}
        # re-shape solver-facing state to the stacked layout
        P, L = self.n_shards, self.n_loc1
        self.rhs = jnp.zeros((P, L, self.n_rhs), self.dtype)
        self.x = jnp.zeros((P, L, self.n_rhs), self.dtype)

    # -- ownership & communication pattern (SegmentedOwnership analog) --------

    def _setup_ownership(self) -> None:
        P = self.n_shards
        nd = self.dofmap.node_dof
        # dof set per shard = active dofs of the nodes of its local elements.
        # Vectorized: per block, dedupe (shard, dof) incidence pairs through a
        # combined integer key, then np.unique across blocks — no Python sets
        # (SegmentedOwnership analog, ``util/SegmentedOwnership.hpp``).
        keys = []
        for _, blk in self.mesh.blocks():
            part = self._parts[id(blk)]
            dofs = nd[blk.nodes]  # (E, n, max_dofs)
            E = dofs.shape[0]
            flat = dofs.reshape(E, -1)
            p_rep = np.repeat(part.astype(np.int64), flat.shape[1])
            d = flat.ravel().astype(np.int64)
            keep = d >= 0
            keys.append(np.unique(p_rep[keep] * self.n_dofs + d[keep]))
        key = np.unique(np.concatenate(keys)) if keys else np.empty(0, np.int64)
        shard_of = key // self.n_dofs
        dof_of = key % self.n_dofs
        # min shard wins ownership
        owner = np.full(self.n_dofs, P, dtype=np.int64)
        np.minimum.at(owner, dof_of, shard_of)
        if (owner >= P).any():
            raise RuntimeError("some dofs belong to no shard")
        self._owner = owner

        # key is sorted by (shard, dof), so per-shard segments are sorted runs
        seg = np.searchsorted(shard_of, np.arange(P + 1))
        owned_lists, ghost_lists = [], []
        is_owned = owner[dof_of] == shard_of
        for p in range(P):
            mine = dof_of[seg[p] : seg[p + 1]]
            mo = is_owned[seg[p] : seg[p + 1]]
            owned_lists.append(mine[mo])
            ghost_lists.append(mine[~mo])
        self._owned = owned_lists
        self._ghost = ghost_lists
        n_loc = max((len(o) + len(g)) for o, g in zip(owned_lists, ghost_lists))
        self.n_loc1 = n_loc + 1  # +1 dump slot
        self._dump = n_loc

        # masks
        owned_mask = np.zeros((P, self.n_loc1))
        free_local = np.zeros((P, self.n_loc1))
        dir_local = np.zeros((P, self.n_loc1))
        free_np = self._free_np
        for p in range(P):
            n_own = len(owned_lists[p])
            owned_mask[p, :n_own] = 1.0
            n_tot = n_own + len(ghost_lists[p])
            all_dofs = np.concatenate([owned_lists[p], ghost_lists[p]])
            fl = free_np[all_dofs].astype(np.float64)
            free_local[p, :n_tot] = fl
            dir_local[p, :n_own] = 1.0 - fl[:n_own]
        self._owned_mask = jnp.asarray(owned_mask, self.dtype)
        self._free_local = jnp.asarray(free_local, self.dtype)
        self._dir_local = jnp.asarray(dir_local, self.dtype)

        # communication pattern: pair (owner j, holder q) exchange lists,
        # grouped by ring OFFSET (q - j) mod P.  Each offset becomes one
        # ppermute with O(pair width) buffers -- the topology-aware analog of
        # ``comm/DistributeMesh.hpp:207-227``: RCB orders parts along a line,
        # so neighbor exchanges ride adjacent ICI links (offsets +-1) instead
        # of a dense O(P^2) all_to_all.
        pair_dofs: dict[tuple[int, int], np.ndarray] = {}
        ms = 1
        for q in range(P):
            gh = ghost_lists[q]
            if not len(gh):
                continue
            ow = owner[gh]
            for j in np.unique(ow):
                lst = gh[ow == j]  # sorted by global id
                pair_dofs[(int(j), q)] = lst
                ms = max(ms, len(lst))
        self._max_send = ms
        by_offset: dict[int, list] = {}
        for (j, q), lst in pair_dofs.items():
            by_offset.setdefault((q - j) % P, []).append((j, q, lst))
        comm = []
        for o in sorted(by_offset):
            pairs = by_offset[o]
            ms_o = max(len(lst) for _, _, lst in pairs)
            SI = np.full((P, ms_o), self._dump, dtype=np.int64)  # owner-side owned slots
            RI = np.full((P, ms_o), self._dump, dtype=np.int64)  # holder-side ghost slots
            SM = np.zeros((P, ms_o))
            for j, q, lst in pairs:
                SI[j, : len(lst)] = self._g2l_map(j, lst)
                RI[q, : len(lst)] = self._g2l_map(q, lst)
                SM[j, : len(lst)] = 1.0
            comm.append(
                (
                    int(o),
                    jnp.asarray(SI, jnp.int32),
                    jnp.asarray(RI, jnp.int32),
                    jnp.asarray(SM, self.dtype),
                )
            )
        self._comm = comm
        self._n_neighbors = len(comm)

        # Dirichlet scatter: (shard, slot) of each global Dirichlet dof (owner side)
        if len(self.dirichlet_dofs):
            ds = self._owner[self.dirichlet_dofs]
            dl = np.empty(len(ds), dtype=np.int64)
            for p in np.unique(ds):
                m = ds == p
                dl[m] = self._g2l_map(int(p), self.dirichlet_dofs[m])
            self._dir_shard = ds
            self._dir_slot = dl
        else:
            self._dir_shard = np.empty(0, dtype=np.int64)
            self._dir_slot = np.empty(0, dtype=np.int64)

    # -- halo exchange ---------------------------------------------------------
    #
    # comm_args inside shard_map is the flat per-offset tuple
    # (SI_0, RI_0, SM_0, SI_1, ...), each (ms_o,) after the shard slice.

    def _comm_offsets(self) -> list[int]:
        return [o for o, *_ in self._comm]

    def _comm_arrays(self):
        out = []
        for _, SI, RI, SM in self._comm:
            out.extend((SI, RI, SM))
        return out

    def _import(self, x, comm_args):
        """Owner -> ghost propagation (Import<T> analog); x (n_loc1, r) per shard.

        One ppermute per neighbor offset: shard j sends its owned halo rows to
        j+o, which writes them into its ghost slots."""
        P = self.n_shards
        for o, (SI, RI, _) in zip(self._comm_offsets(), zip(*[iter(comm_args)] * 3)):
            buf = x[SI]
            buf = jax.lax.ppermute(buf, "shards", [(p, (p + o) % P) for p in range(P)])
            x = x.at[RI].set(buf)
        return x

    def _export(self, y, comm_args):
        """Ghost -> owner accumulation (Export<T> + AtomicSumInto analog)."""
        P = self.n_shards
        for o, (SI, RI, SM) in zip(self._comm_offsets(), zip(*[iter(comm_args)] * 3)):
            buf = y[RI]
            buf = jax.lax.ppermute(buf, "shards", [(p, (p - o) % P) for p in range(P)])
            y = y.at[SI].add(buf * SM[:, None])
        return y

    # -- assembly ---------------------------------------------------------------

    def _begin_impl(self) -> None:
        self._contribs = []
        self._diag = None
        self._data = None
        self._asm = None
        self._gathered_csr = None
        self._cond_blocks = {}
        self._cond_YZ = {}
        self.rhs = jnp.zeros((self.n_shards, self.n_loc1, self.n_rhs), self.dtype)

    def _g2l_map(self, p: int, gd: np.ndarray) -> np.ndarray:
        """Vectorized global->local dof slots for shard p ([owned | ghost] are
        sorted segments); -1 (condensed-out) dofs map to the dump slot."""
        own, gh = self._owned[p], self._ghost[p]
        neg = gd < 0
        g = np.where(neg, 0, gd)
        pos_o = np.searchsorted(own, g)
        pos_o_c = np.minimum(pos_o, max(len(own) - 1, 0))
        is_o = (pos_o < len(own)) & (own[pos_o_c] == g) if len(own) else np.zeros_like(g, bool)
        pos_g = np.searchsorted(gh, g)
        pos_g_c = np.minimum(pos_g, max(len(gh) - 1, 0))
        is_g = (pos_g < len(gh)) & (gh[pos_g_c] == g) if len(gh) else np.zeros_like(g, bool)
        if not (is_o | is_g | neg).all():
            raise RuntimeError("element dof not present in its shard's local dof set")
        out = np.where(is_o, pos_o_c, len(own) + pos_g_c)
        out[neg] = self._dump
        return out

    def _bucket_parts(self, c: _Contribution, nodes: np.ndarray, part: np.ndarray) -> _ShardBucket:
        P = self.n_shards
        E_max = max(1, int(np.bincount(part, minlength=P).max()))
        n_nodes, n_unk = c.elem_dofs.shape[1], c.elem_dofs.shape[2]
        verts = np.tile(c.verts[:1], (P, E_max, 1, 1))
        lidx = np.full((P, E_max, n_nodes * n_unk), self._dump, dtype=np.int64)
        fields = None
        fa = None
        if c.field_access is not None:
            fa, _ = c.field_access
            fields = np.zeros((P, E_max, n_nodes, fa.n_fields))
            fvals = np.asarray(fa.values)
        for p in range(P):
            sel = np.nonzero(part == p)[0]
            if not len(sel):
                continue
            verts[p, : len(sel)] = c.verts[sel]
            gd = c.elem_dofs[sel].reshape(len(sel), -1)
            lidx[p, : len(sel)] = self._g2l_map(p, gd)
            if fields is not None:
                slots = np.asarray(fa.slots, dtype=np.int64)
                fields[p, : len(sel)] = fvals[nodes[sel]][:, :, slots]
        return _ShardBucket(
            kernel=c.kernel,
            tables=c.tables,
            options=c.options,
            time=c.time,
            verts=verts,
            local_idx=lidx,
            shape=(n_nodes, n_unk),
            fields=fields,
            mode=c.mode,
            cond=self._cond_info(c, part),
            src=c,
        )

    def _cond_info(self, c: _Contribution, part: np.ndarray) -> dict | None:
        """Condensation metadata for one contribution (distributed analog of
        ``AssembledSystem._add_condensed`` index maps;
        ``StaticCondensationManager.hpp:152-207``).  Elements are uniquely
        owned by a shard, so each shard's per-element Schur data is complete."""
        from ..common.enums import CondensationPolicy
        from ..mesh.traits import internal_node_indices

        blk = c.block
        if not (
            self.params.cond_policy == CondensationPolicy.ELEMENT_BOUNDARY
            and blk.dim == self.mesh.dim
            and len(internal_node_indices(blk.element_type, blk.order))
        ):
            return None
        from ..algsys.system import _cond_selectors

        entry = self._get_cond_block(c)
        b_sel, tb, i_sel, ti = _cond_selectors(
            entry["act"], entry["b_nodes"], entry["i_nodes"], blk.nodes.shape[1], c.dof_inds
        )
        # per-shard map: bucket element slot -> block aggregate row
        P = self.n_shards
        E_max_c = max(1, int(np.bincount(part, minlength=P).max()))
        rows = np.full((P, E_max_c), entry["E_max"], dtype=np.int64)  # pad -> discard row
        for p in range(P):
            sel = np.nonzero(part == p)[0]
            if not len(sel):
                continue
            if c.elem_sel is None:
                rows[p, : len(sel)] = np.arange(len(sel))
            else:
                rank = {int(g): i for i, g in enumerate(entry["order"][p])}
                rows[p, : len(sel)] = [rank[int(g)] for g in np.asarray(c.elem_sel)[sel]]
        return dict(block_id=id(blk), b_sel=b_sel, i_sel=i_sel, tb=tb, ti=ti, rows=rows)

    def _get_cond_block(self, c: _Contribution) -> dict:
        """Per-block condensation aggregate spec (shared by all contributions
        on the block): boundary-space local dof slots and shard element order."""
        blk = c.block
        entry = self._cond_blocks.get(id(blk))
        if entry is not None:
            return entry
        from ..mesh.traits import boundary_node_indices, internal_node_indices

        act = np.nonzero(self.problem.active_mask(c.domain_id))[0]
        b_nodes = boundary_node_indices(blk.element_type, blk.order)
        i_nodes = internal_node_indices(blk.element_type, blk.order)
        nb, ni = len(b_nodes) * len(act), len(i_nodes) * len(act)
        part = self._parts[id(blk)]
        P = self.n_shards
        order = [np.nonzero(part == p)[0] for p in range(P)]
        E_max = max(1, max(len(o) for o in order))
        b_dofs_g = self.dofmap.node_dof[blk.nodes[:, b_nodes]][:, :, act].reshape(
            blk.n_elements, nb
        )
        b_lidx = np.full((P, E_max, nb), self._dump, dtype=np.int64)
        for p in range(P):
            if len(order[p]):
                b_lidx[p, : len(order[p])] = self._g2l_map(p, b_dofs_g[order[p]])
        entry = dict(
            block=blk,
            act=act,
            b_nodes=b_nodes,
            i_nodes=i_nodes,
            nb=nb,
            ni=ni,
            order=order,
            E_max=E_max,
            b_dofs_g=b_dofs_g,
            b_lidx=b_lidx,
        )
        self._cond_blocks[id(blk)] = entry
        return entry

    def _add_contribution(self, c: _Contribution) -> None:
        blk = c.block
        if c.elem_sel is None:
            part = self._parts[id(blk)]
            nodes = blk.nodes
        else:
            part = self._parts[id(blk)][c.elem_sel]
            nodes = blk.nodes[c.elem_sel]
        self._contribs.append(self._bucket_parts(c, nodes, part))

    # -- traced per-shard element compute ---------------------------------------

    def _dense_ok(self, b: _ShardBucket) -> bool:
        """Mirror of the single-chip dense-MXU decision (``system.py``)."""
        import os

        from ..common.enums import LocalEvalStrategy

        strat = b.options.eval_strategy
        if b.tables.side is not None:
            return False
        if strat == LocalEvalStrategy.DENSE_MXU:
            return True
        if strat != LocalEvalStrategy.AUTO:
            return False
        if os.environ.get("L3STER_TPU_DENSE", "1") in ("0", "false"):
            return False
        return jax.default_backend() == "tpu" and b.tables.order >= 2

    def _bucket_op_data(self, b: _ShardBucket):
        """Precompute the x-independent packed operator tensors of one bucket,
        stacked over shards -- full parity with the single-chip
        ``MatrixFreeSystem._operator_data`` (geometry and kernel coefficients
        are evaluated once per assembly, never inside the CG loop).

        Returns (kind, static_A, arrays, sharded_flags): each array in
        ``arrays`` is sharded over the leading axis iff its flag is True.
        """
        if getattr(b, "op_data", None) is not None:
            return b.op_data
        from ..algsys.system import _constant_kernel_operators

        dtype = self.dtype
        tab = b.tables
        dim = tab.dim
        P, E_max = b.verts.shape[:2]
        Q = tab.n_qp
        use_dense = self._dense_ok(b)
        use_sf = (not use_dense) and self._sumfact_ok(b)
        A_const = None
        if (use_dense or use_sf) and b.fields is None:
            A_const = _constant_kernel_operators(b.kernel, b.time)

        verts = jnp.asarray(b.verts, dtype)
        fields = jnp.asarray(b.fields, dtype) if b.fields is not None else None

        @jax.jit
        def compute(verts, fields):
            geom = element_geometry(
                tab,
                verts.reshape((P * E_max,) + verts.shape[2:]),
                with_phys_ders=not (use_dense or use_sf) or fields is not None,
            )
            fv = fd = None
            if fields is not None:
                fv, fd = eval_fields(
                    tab, geom, fields.reshape((P * E_max,) + fields.shape[2:])
                )
            if not (use_dense or use_sf):
                A, _ = eval_equation_kernel(b.kernel, geom, fv, fd, b.time, dtype)
                B = _basis_stack(tab, geom, dtype)
                return (
                    A.reshape((P, E_max) + A.shape[1:]),
                    B.reshape((P, E_max) + B.shape[1:]),
                    geom.weights.reshape(P, E_max, Q),
                )
            Ji_t = jnp.moveaxis(geom.jac_inv.reshape(P, E_max * Q, dim, dim), 1, -1)
            w_t = geom.weights.reshape(P, E_max * Q)
            if A_const is not None:
                return Ji_t, w_t
            A, _ = eval_equation_kernel(b.kernel, geom, fv, fd, b.time, dtype)
            A_t = jnp.moveaxis(A.reshape((P, E_max * Q) + A.shape[2:]), 1, -1)
            return A_t, Ji_t, w_t

        out = compute(verts, fields)
        if use_dense:
            from ..ops.dense_eval import dense_basis_matrix

            Ball = jnp.asarray(dense_basis_matrix(tab), dtype)
            if A_const is not None:
                b.op_data = ("dense_const", A_const, (*out, Ball), (True, True, False))
            else:
                b.op_data = ("dense", None, (*out, Ball), (True, True, True, False))
        elif use_sf:
            if A_const is not None:
                b.op_data = ("sumfact_const", A_const, out, (True, True))
            else:
                b.op_data = ("sumfact", None, out, (True, True, True))
        else:
            b.op_data = ("direct", None, out, (True, True, True))
        return b.op_data

    def _bucket_apply_packed(self, b: _ShardBucket, kind, static_A, arrs, lidx, xg, dtype):
        """Per-shard (inside shard_map): y contribution of one bucket from its
        precomputed packed tensors (no geometry or kernel re-evaluation)."""
        from ..algsys.local import (
            local_apply_dense_const,
            local_apply_dense_packed,
            local_apply_sumfact_const,
            local_apply_sumfact_packed,
        )

        n_nodes, n_unk = b.shape
        E = lidx.shape[0]
        q_order = b.options.quadrature_order(b.tables.order)
        dim = b.tables.dim
        y_parts = []
        for r in range(self.n_rhs):
            x_loc = xg[lidx.reshape(-1), r].reshape(E, n_nodes, n_unk)
            if kind == "dense_const":
                Ji_t, w_t, Ball = arrs
                y_loc = local_apply_dense_const(static_A, Ji_t, w_t, Ball, E, dim, x_loc)
            elif kind == "dense":
                A_t, Ji_t, w_t, Ball = arrs
                y_loc = local_apply_dense_packed(A_t, Ji_t, w_t, Ball, E, dim, x_loc)
            elif kind == "sumfact_const":
                Ji_t, w_t = arrs
                y_loc = local_apply_sumfact_const(
                    static_A, Ji_t, w_t, E, b.tables.order, q_order, dim, x_loc
                )
            elif kind == "sumfact":
                A_t, Ji_t, w_t = arrs
                y_loc = local_apply_sumfact_packed(
                    A_t, Ji_t, w_t, E, b.tables.order, q_order, dim, x_loc
                )
            else:
                A, B, w = arrs
                y_loc = local_apply_direct(A, B, w, x_loc)
            y_parts.append(y_loc.reshape(-1))
        return y_parts

    def _sumfact_ok(self, b: _ShardBucket) -> bool:
        from ..common.enums import LocalEvalStrategy
        from ..ops.sumfact import supports_sumfact

        strat = b.options.eval_strategy
        if b.tables.side is not None or strat == LocalEvalStrategy.DIRECT:
            return False
        if strat == LocalEvalStrategy.SUM_FACT:
            if not supports_sumfact(b.tables.element_type):
                raise ValueError("sum factorization requires tensor-product Quad/Hex elements")
            return True
        return supports_sumfact(b.tables.element_type) and b.tables.order >= 2

    @property
    def _assembled_mode(self) -> bool:
        return self.params.eval_strategy == OperatorEvaluationStrategy.GLOBAL_ASSEMBLY

    def _setup_assembled(self) -> None:
        """Per-shard local CSR pattern over [owned | ghost | dump] dof slots.

        The distributed assembled operator is the sum of per-shard partial
        matrices (each shard's own element contributions, including ghost
        rows): apply = import -> local SpMV -> ghost export, exactly the
        Tpetra FECrsMatrix semantics without a cross-shard matrix migration.
        """
        P, L1 = self.n_shards, self.n_loc1
        op_buckets = [b for b in self._contribs if b.mode != "rhs"]
        keys_per_shard = []
        for p in range(P):
            parts = []
            for b in op_buckets:
                li = b.local_idx[p]  # (E_max, L)
                Lw = li.shape[1]
                r = np.repeat(li, Lw, axis=1).reshape(-1)
                cc = np.tile(li, (1, Lw)).reshape(-1)
                parts.append(np.unique(r * L1 + cc))
            for entry in self._cond_blocks.values():
                # Schur complement couples the element's full boundary space
                bl = entry["b_lidx"][p]
                nb = bl.shape[1]
                r = np.repeat(bl, nb, axis=1).reshape(-1)
                cc = np.tile(bl, (1, nb)).reshape(-1)
                parts.append(np.unique(r * L1 + cc))
            keys_per_shard.append(np.unique(np.concatenate(parts)) if parts else
                                  np.asarray([self._dump * L1 + self._dump]))
        self._nnz_per_shard = [len(k) for k in keys_per_shard]
        nnz_max = max(len(k) for k in keys_per_shard)
        rows = np.full((P, nnz_max), self._dump, dtype=np.int64)
        cols = np.full((P, nnz_max), self._dump, dtype=np.int64)
        pos_per_bucket = [
            np.zeros((P, b.local_idx.shape[1] * b.local_idx.shape[2] ** 2), dtype=np.int64)
            for b in op_buckets
        ]
        schur_pos = {
            bid: np.zeros(
                (P, entry["E_max"], entry["nb"], entry["nb"]), dtype=np.int64
            )
            for bid, entry in self._cond_blocks.items()
        }
        for p in range(P):
            k = keys_per_shard[p]
            # keep sorted; pad keys sort after real ones iff dump is the max slot
            rows[p, : len(k)] = k // L1
            cols[p, : len(k)] = k % L1
            for bi, b in enumerate(op_buckets):
                li = b.local_idx[p]
                Lw = li.shape[1]
                r = np.repeat(li, Lw, axis=1).reshape(-1)
                cc = np.tile(li, (1, Lw)).reshape(-1)
                pos = np.searchsorted(k, r * L1 + cc)
                pos_per_bucket[bi][p] = pos
            for bid, entry in self._cond_blocks.items():
                bl = entry["b_lidx"][p]
                kk = bl[:, :, None] * L1 + bl[:, None, :]
                schur_pos[bid][p] = np.searchsorted(k, kk)
        # per-shard diagonal extraction positions (rows == cols); the diagonal
        # of the ASSEMBLED (post-Schur) matrix feeds Jacobi/Chebyshev
        dsel = [np.nonzero(rows[p] == cols[p])[0] for p in range(P)]
        nd_max = max(1, max(len(d) for d in dsel))
        dpos = np.zeros((P, nd_max), dtype=np.int64)
        drow = np.full((P, nd_max), self._dump, dtype=np.int64)
        for p in range(P):
            dpos[p, : len(dsel[p])] = dsel[p]
            drow[p, : len(dsel[p])] = rows[p][dsel[p]]
        # rows must be sorted per shard for segment_sum(indices_are_sorted)
        self._asm = {
            "rows": jnp.asarray(rows, jnp.int32),
            "cols": jnp.asarray(cols, jnp.int32),
            "pos": [jnp.asarray(pp, jnp.int32) for pp in pos_per_bucket],
            "nnz": nnz_max,
            "buckets": op_buckets,
            "schur_pos": {bid: jnp.asarray(sp, jnp.int32) for bid, sp in schur_pos.items()},
            "dpos": jnp.asarray(dpos, jnp.int32),
            "drow": jnp.asarray(drow, jnp.int32),
        }

    def _op_plumbing(self):
        """Flattened packed-operator arrays + dispatch specs for the apply.

        Returns (bucket_specs, arrays, sharded_flags): bucket_specs entries are
        (bucket, kind, static_A, array offset, n op arrays); each bucket's
        arrays are followed by its local-index array.
        """
        bucket_specs, arrays, flags = [], [], []
        for b in self._contribs:
            if b.mode == "rhs":
                continue
            kind, static_A, arrs, sh = self._bucket_op_data(b)
            bucket_specs.append((b, kind, static_A, len(arrays), len(arrs)))
            arrays.extend(arrs)
            flags.extend(sh)
            arrays.append(jnp.asarray(b.local_idx, jnp.int32))
            flags.append(True)
        return bucket_specs, arrays, flags

    def _shard_fn(self, bucket_specs, op_flags, constrained: bool):
        """Build the per-shard traced function."""
        dtype = self.dtype
        n_comm = 3 * self._n_neighbors

        if self._assembled_mode:
            L1 = self.n_loc1

            def fn(x, free_l, dir_l, owned_l, *rest):
                x = x[0]
                free_l, dir_l, owned_l = free_l[0], dir_l[0], owned_l[0]
                comm_args = [a[0] for a in rest[:n_comm]]
                data, rows, cols = (a[0] for a in rest[n_comm:])
                xm = x * free_l[:, None] if constrained else x
                xg = self._import(xm, comm_args)
                y = jax.ops.segment_sum(
                    data[:, None] * xg[cols], rows, num_segments=L1, indices_are_sorted=True
                )
                y = self._export(y, comm_args)
                y = y * owned_l[:, None]
                if constrained:
                    y = y * free_l[:, None] + x * dir_l[:, None]
                return y[None]

            return fn

        def fn(x, free_l, dir_l, owned_l, *rest):
            # shard_map blocks keep a leading local axis of size 1 on sharded
            # args: drop it; replicated args pass through whole
            x = x[0]
            free_l, dir_l, owned_l = free_l[0], dir_l[0], owned_l[0]
            comm_args = [a[0] for a in rest[:n_comm]]
            op_arrays = [a[0] if f else a for a, f in zip(rest[n_comm:], op_flags)]
            xm = x * free_l[:, None] if constrained else x
            xg = self._import(xm, comm_args)
            y = jnp.zeros_like(x)
            for b, kind, static_A, off, n_arr in bucket_specs:
                arrs = tuple(op_arrays[off : off + n_arr])
                lidx = op_arrays[off + n_arr]
                y_parts = self._bucket_apply_packed(b, kind, static_A, arrs, lidx, xg, dtype)
                for r, yp in enumerate(y_parts):
                    y = y.at[lidx.reshape(-1), r].add(yp)
            y = self._export(y, comm_args)
            y = y * owned_l[:, None]
            if constrained:
                y = y * free_l[:, None] + x * dir_l[:, None]
            return y[None]

        return fn

    def raw_operator(self):
        """The constrained distributed operator is built in operator()."""
        raise NotImplementedError("DistributedSystem uses operator() directly")

    def _shard_apply_pieces(self, constrained: bool = True):
        """Operator pieces for composing the apply INSIDE another shard_map
        (e.g. the distributed PMultigrid V-cycle smoother).

        Returns ``(fn, arrays, flags, sig)``: ``fn`` is the per-shard traced
        function in the (1, ...)-sliced argument convention
        (``fn(x, free_l, dir_l, owned_l, *comm, *arrays)`` -> owned-masked y),
        ``arrays`` the packed operator tensors, ``flags`` whether each is
        sharded over the leading axis, and ``sig`` a hashable STRUCTURE
        signature — callers may cache traced programs keyed on it and feed
        fresh ``arrays`` from later assembly epochs of identical structure.
        """
        import hashlib

        if self._assembled_mode:
            if self._data is None:
                raise RuntimeError(
                    "assembled distributed operator available after end_assembly"
                )
            fn = self._shard_fn(None, None, constrained)
            arrays = [self._data, self._asm["rows"], self._asm["cols"]]
            flags = [True, True, True]
            sig = ("asm", self._data.shape, constrained, self._n_neighbors)
            return fn, arrays, flags, sig
        bucket_specs, arrays, flags = self._op_plumbing()
        fn = self._shard_fn(bucket_specs, flags, constrained)
        parts = []
        for b, kind, static_A, off, n_arr in bucket_specs:
            if static_A is None:
                ah = None
            else:  # tiny coefficient tensors; changes with kernel/time
                ah = hashlib.sha1(
                    np.ascontiguousarray(np.asarray(static_A, np.float64)).tobytes()
                ).hexdigest()
            parts.append(
                (id(b.kernel), id(b.tables), b.mode, b.shape, b.verts.shape,
                 kind, ah, off, n_arr)
            )
        sig = ("mf", constrained, self._n_neighbors, tuple(parts))
        return fn, arrays, flags, sig

    def _sharded_apply(self, constrained: bool):
        from jax.sharding import PartitionSpec as P

        mesh = self.device_mesh
        if self._assembled_mode:
            if self._data is None:
                raise RuntimeError("assembled distributed operator available after end_assembly")
            fn = self._shard_fn(None, None, constrained)
            n_args = 4 + 3 * self._n_neighbors + 3
            in_specs = (P("shards"),) * n_args
            sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=P("shards"))
            consts = (
                self._free_local, self._dir_local, self._owned_mask,
                *self._comm_arrays(),
                self._data, self._asm["rows"], self._asm["cols"],
            )
            return sharded, consts
        bucket_specs, arrays, flags = self._op_plumbing()
        fn = self._shard_fn(bucket_specs, flags, constrained)
        in_specs = (
            (P("shards"),) * (4 + 3 * self._n_neighbors)
            + tuple(P("shards") if f else P() for f in flags)
        )
        sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=P("shards"))
        consts = (
            self._free_local, self._dir_local, self._owned_mask,
            *self._comm_arrays(),
            *arrays,
        )
        return sharded, consts

    def operator_parts(self):
        # stable fn identity per assembly epoch: repeated solves between
        # reassemblies reuse the cached jitted solve program (zero re-trace)
        epoch = getattr(self, "_assembly_epoch", None)
        cache = getattr(self, "_op_parts_cache", None)
        if cache is not None and cache[0] == epoch:
            return cache[1], cache[2]
        sharded, consts = self._sharded_apply(constrained=True)
        fn = lambda x, *cs: sharded(x, *cs)  # noqa: E731
        self._op_parts_cache = (epoch, fn, consts)
        return fn, consts

    def operator(self):
        fn, consts = self.operator_parts()
        return lambda x: fn(x, *consts)

    def _raw_apply_once(self, x):
        """Unconstrained apply (for effective rhs): same pipeline minus masking."""
        sharded, consts = self._sharded_apply(constrained=False)
        return sharded(x, *consts)

    def _end_impl(self) -> None:
        from jax.sharding import PartitionSpec as P

        dtype = self.dtype
        buckets = list(self._contribs)
        assembled = self._assembled_mode
        if assembled:
            self._setup_assembled()
            pos_map = {id(b): pos for b, pos in zip(self._asm["buckets"], self._asm["pos"])}
        else:
            pos_map = {}
        cond_ids = sorted(self._cond_blocks)  # deterministic aggregate order

        n_comm = 3 * self._n_neighbors

        # stacked per-shard input arrays, in the exact order fn consumes them
        args = []
        for b in buckets:
            args.append(jnp.asarray(b.verts, dtype))
            args.append(jnp.asarray(b.local_idx, jnp.int32))
            if b.fields is not None:
                args.append(jnp.asarray(b.fields, dtype))
            if assembled and b.mode != "rhs":
                args.append(pos_map[id(b)])
            if b.cond is not None:
                args.append(jnp.asarray(b.cond["rows"], jnp.int32))
        for bid in cond_ids:
            args.append(jnp.asarray(self._cond_blocks[bid]["b_lidx"], jnp.int32))
            args.append(self._asm["schur_pos"][bid])
        if assembled:
            args.append(self._asm["dpos"])
            args.append(self._asm["drow"])

        def fn(owned_l, *rest):
            from ..algsys.local import (
                local_diagonal_sumfact,
                local_rhs_sumfact,
                local_system,
            )
            from ..algsys.system import _schur_factors

            owned_l = owned_l[0]
            comm_args = [a[0] for a in rest[:n_comm]]
            it = iter(a[0] for a in rest[n_comm:])
            rhs = jnp.zeros((self.n_loc1, self.n_rhs), dtype)
            diag = jnp.zeros((self.n_loc1, 1), dtype)
            data = (
                jnp.zeros((self._asm["nnz"],), dtype) if assembled else jnp.zeros((1,), dtype)
            )
            # per-block condensation aggregates, one extra discard row for padding
            aggs = {}
            for bid in cond_ids:
                e = self._cond_blocks[bid]
                E1, nb, ni = e["E_max"] + 1, e["nb"], e["ni"]
                aggs[bid] = [
                    jnp.zeros((E1, nb, ni), dtype),
                    jnp.zeros((E1, ni, ni), dtype),
                    jnp.zeros((E1, ni, self.n_rhs), dtype),
                ]
            def bucket_piece(b, use_sf, verts_c, lidx_c, pos_c, fv, fd, rhs, diag, data):
                """rhs/diag/data contributions of one element slice of bucket b
                (linear in the element axis, so chunked accumulation is exact)."""
                geom = element_geometry(
                    b.tables, verts_c,
                    with_phys_ders=(assembled or not use_sf or fv is not None),
                )
                A, f = eval_equation_kernel(b.kernel, geom, fv, fd, b.time, dtype)
                q_order = b.options.quadrature_order(b.tables.order)
                idx = lidx_c.reshape(-1)
                F = K = None
                if b.mode != "operator":
                    if use_sf:
                        F = local_rhs_sumfact(A, geom, b.tables.order, q_order, b.tables.dim, f)
                    else:
                        B = _basis_stack(b.tables, geom, dtype)
                        F = local_rhs(A, B, geom.weights, f)
                    # interior (condensed-out) rows land on the dump slot
                    rhs = rhs.at[idx].add(F.reshape(-1, self.n_rhs))
                if b.mode != "rhs":
                    if not assembled:
                        if use_sf:
                            d = local_diagonal_sumfact(
                                A, geom, b.tables.order, q_order, b.tables.dim
                            )
                        else:
                            B = _basis_stack(b.tables, geom, dtype)
                            d = local_diagonal(A, B, geom.weights)
                        diag = diag.at[idx].add(d.reshape(-1, 1))
                    else:
                        K, _ = local_system(b.kernel, b.tables, geom, fv, fd, b.time, dtype)
                        # full-K scatter: interior rows/cols point at the dump
                        # slot's CSR entries, which the apply masks away, so
                        # only the Kbb part survives in the global system
                        data = data.at[pos_c.reshape(-1)].add(K.reshape(-1))
                return F, K, rhs, diag, data

            for b in buckets:
                verts_dev = next(it)
                lidx_dev = next(it)
                fields_dev = next(it) if b.fields is not None else None
                pos = next(it) if assembled and b.mode != "rhs" else None
                cr = next(it) if b.cond is not None else None
                use_sf = self._sumfact_ok(b)
                E_max = verts_dev.shape[0]
                chunk = int(max(1, (1 << 25) // max(b.tables.n_qp * 128, 1)))
                if b.fields is None and b.cond is None and E_max > chunk:
                    # large field-free bucket: scan over element chunks so the
                    # padded (E, Q, ...) geometry intermediates never OOM HBM
                    # (distributed analog of the single-chip chunking,
                    # ``algsys/system.py:835-901``); padding elements carry the
                    # dump slot, so partial-chunk tails are handled inline
                    has_pos = assembled and b.mode != "rhs"
                    n_full = E_max // chunk
                    pos2 = pos.reshape(E_max, -1) if has_pos else None

                    def body(carry, xs, b=b, use_sf=use_sf, has_pos=has_pos):
                        rhs, diag, data = carry
                        v, li, po = xs if has_pos else (*xs, None)
                        _, _, rhs, diag, data = bucket_piece(
                            b, use_sf, v, li, po, None, None, rhs, diag, data
                        )
                        return (rhs, diag, data), None

                    n_main = n_full * chunk
                    xs = (
                        verts_dev[:n_main].reshape((n_full, chunk) + verts_dev.shape[1:]),
                        lidx_dev[:n_main].reshape(n_full, chunk, -1),
                    )
                    if has_pos:
                        xs = xs + (pos2[:n_main].reshape(n_full, chunk, -1),)
                    (rhs, diag, data), _ = jax.lax.scan(body, (rhs, diag, data), xs)
                    if n_main < E_max:
                        _, _, rhs, diag, data = bucket_piece(
                            b, use_sf, verts_dev[n_main:], lidx_dev[n_main:],
                            pos2[n_main:] if has_pos else None,
                            None, None, rhs, diag, data,
                        )
                    continue
                fv = fd = None
                if fields_dev is not None:
                    geom_f = element_geometry(
                        b.tables, jnp.asarray(verts_dev, dtype), with_phys_ders=True
                    )
                    fv, fd = eval_fields(b.tables, geom_f, jnp.asarray(fields_dev, dtype))
                F, K, rhs, diag, data = bucket_piece(
                    b, use_sf, jnp.asarray(verts_dev, dtype), lidx_dev,
                    pos, fv, fd, rhs, diag, data,
                )
                if b.cond is not None:
                    bs, isel = b.cond["b_sel"], b.cond["i_sel"]
                    tb, ti = b.cond["tb"], b.cond["ti"]
                    agg = aggs[b.cond["block_id"]]
                    if K is not None:
                        agg[0] = agg[0].at[
                            cr[:, None, None], tb[None, :, None], ti[None, None, :]
                        ].add(K[:, bs][:, :, isel])
                        agg[1] = agg[1].at[
                            cr[:, None, None], ti[None, :, None], ti[None, None, :]
                        ].add(K[:, isel][:, :, isel])
                    if F is not None:
                        Ff = F.reshape(F.shape[0], -1, self.n_rhs)  # node-major -> flat dofs
                        agg[2] = agg[2].at[cr[:, None], ti[None, :]].add(Ff[:, isel])
            # per-element Schur complements (StaticCondensationManager analog):
            # each element is owned by exactly one shard, so its interior data
            # is complete here; the boundary-space updates flow through the
            # regular ghost export
            cond_out = []
            for bid in cond_ids:
                Kbi_a, Kii_a, Fi_a = aggs[bid]
                Y, Z, npart = _schur_factors(
                    Kii_a, jnp.swapaxes(Kbi_a, 1, 2), Fi_a, dtype
                )
                Y, Z, Kbi_t = Y[:-1], Z[:-1], Kbi_a[:-1]
                bl = next(it)  # (E_max, nb) boundary-space local slots
                sp = next(it)  # (E_max, nb, nb) CSR positions
                schur = -jnp.einsum("ebi,eij->ebj", Kbi_t, Y)
                data = data.at[sp.reshape(-1)].add(schur.reshape(-1))
                rhs_corr = -jnp.einsum("ebi,eir->ebr", Kbi_t, Z)
                rhs = rhs.at[bl.reshape(-1)].add(rhs_corr.reshape(-1, self.n_rhs))
                cond_out.extend([Y[None], Z[None], npart.reshape(1, 1).astype(dtype)])
            if assembled:
                # diagonal of the assembled (post-Schur) matrix from the CSR
                dpos = next(it)
                drow = next(it)
                diag = diag.at[drow].add(data[dpos][:, None])
            rhs = self._export(rhs, comm_args) * owned_l[:, None]
            diag = self._export(diag, comm_args) * owned_l[:, None]
            return (rhs[None], diag[None], data[None], *cond_out)

        n_out = 3 + 3 * len(cond_ids)
        in_specs = (P("shards"),) * (1 + n_comm + len(args))
        sharded = jax.shard_map(
            fn, mesh=self.device_mesh, in_specs=in_specs,
            out_specs=(P("shards"),) * n_out,
        )
        outs = sharded(self._owned_mask, *self._comm_arrays(), *args)
        rhs, diag, data = outs[0], outs[1], outs[2]
        self._cond_YZ = {}
        for i, bid in enumerate(cond_ids):
            Y, Z, npart = outs[3 + 3 * i : 6 + 3 * i]
            if float(np.asarray(npart).sum()) > 0:
                raise RuntimeError(
                    "static condensation: element interiors only partially assembled "
                    "(kernel dof_inds must cover all active dofs of the condensed domain)"
                )
            self._cond_YZ[bid] = (np.asarray(Y), np.asarray(Z))
        if assembled:
            self._data = data
        self.rhs = rhs
        diag = diag[:, :, 0]
        # unit diagonal on non-owned slots and Dirichlet dofs for Jacobi
        self._diag = diag * self._free_local * self._owned_mask + (
            1.0 - self._free_local * self._owned_mask
        )

    # -- assembled-matrix export (Schwarz preconditioners, direct solvers) ------

    def gathered_csr(self):
        """Host-side GLOBAL Dirichlet-eliminated CSR assembled from the
        per-shard partial matrices (GLOBAL_ASSEMBLY mode only).

        The distributed apply keeps rows partial (each shard's own element
        contributions) and completes them with the ghost export; summing the
        per-shard COO triplets over GLOBAL dof ids reproduces the fully
        assembled Tpetra matrix.  Feeds the additive-Schwarz preconditioners
        (``solve/Ifpack2Preconditioners.hpp:85-192`` under MPI) and the
        distributed direct solvers (``solve/Amesos2Solvers.hpp:13-49``).
        Returns ``(data, indices, indptr, n_dofs)``.
        """
        if self._data is None:
            raise RuntimeError(
                "gathered_csr requires GLOBAL_ASSEMBLY and a completed end_assembly"
            )
        if getattr(self, "_gathered_csr", None) is not None:
            return self._gathered_csr
        import scipy.sparse as sp

        P = self.n_shards
        rows = np.asarray(self._asm["rows"], dtype=np.int64)
        cols = np.asarray(self._asm["cols"], dtype=np.int64)
        data = np.asarray(self._data, dtype=np.float64)
        coo_r, coo_c, coo_v = [], [], []
        for p in range(P):
            lg = np.concatenate([self._owned[p], self._ghost[p]])
            keep = (rows[p] < len(lg)) & (cols[p] < len(lg))
            coo_r.append(lg[rows[p][keep]])
            coo_c.append(lg[cols[p][keep]])
            coo_v.append(data[p][keep])
        A = sp.coo_matrix(
            (np.concatenate(coo_v), (np.concatenate(coo_r), np.concatenate(coo_c))),
            shape=(self.n_dofs, self.n_dofs),
        ).tocsr()
        A.sum_duplicates()
        A.sort_indices()
        # Dirichlet elimination IN PLACE: zero rows/cols, unit diagonal
        # (mirrors the single-device ``AssembledSystem.eliminated_csr``).
        # No scipy sparse arithmetic here -- it prunes exact zeros, and
        # shard-order roundoff makes A(i,j) exactly 0.0 while A(j,i) is 1e-17,
        # which would leave an ASYMMETRIC pattern (breaking ILU0 symmetry and
        # with it CG).  In-place edits keep the symmetric element pattern.
        free = self._free_np
        r_all = np.repeat(np.arange(self.n_dofs), np.diff(A.indptr))
        A.data[~(free[r_all] & free[A.indices])] = 0.0
        diag_sel = r_all == A.indices
        diag_rows = r_all[diag_sel]
        dvals = np.where(free[diag_rows], A.data[diag_sel], 1.0)
        A.data[diag_sel] = dvals
        self._gathered_csr = (A.data, A.indices, A.indptr, self.n_dofs)
        return self._gathered_csr

    def shard_blocks(self, overlap: int = 0):
        """Per-shard local sub-blocks of the gathered matrix for additive
        Schwarz: for each shard, the rows/cols restricted to its owned dofs
        (``overlap=0``, symmetric — safe for CG) or owned+ghost dofs
        (``overlap=1``, RAS).  Returns a list of ``(scipy_csr, n_real)`` in
        LOCAL slot numbering (slot i = i-th entry of [owned | ghost]).
        """
        import scipy.sparse as sp

        data, indices, indptr, n = self.gathered_csr()
        A = sp.csr_matrix((data, indices, indptr), shape=(n, n))
        out = []
        for p in range(self.n_shards):
            ids = (
                self._owned[p]
                if overlap == 0
                else np.concatenate([self._owned[p], self._ghost[p]])
            )
            sub = A[ids][:, ids].tocsr()
            sub.sort_indices()
            out.append((sub, len(ids)))
        return out

    def effective_rhs_global(self) -> np.ndarray:
        """Host (n_dofs, n_rhs) gather of the effective rhs (direct solvers)."""
        so, lo, go = self._owner_plan()
        bg = np.zeros((self.n_dofs, self.n_rhs))
        bg[go] = np.asarray(self.effective_rhs())[so, lo]
        return bg

    # -- solver-facing overrides -------------------------------------------------

    def dirichlet_extension(self):
        g = jnp.zeros((self.n_shards, self.n_loc1, self.n_rhs), self.dtype)
        if len(self.dirichlet_dofs):
            g = g.at[(jnp.asarray(self._dir_shard), jnp.asarray(self._dir_slot))].set(
                self.dirichlet_values
            )
        return g

    def effective_rhs(self):
        if self._effective_rhs is None:
            g = self.dirichlet_extension()
            y = self._raw_apply_once(g)
            free = self._free_local[:, :, None]
            self._effective_rhs = free * (self.rhs - y) + g
        return self._effective_rhs

    def diagonal(self):
        if self._diag is None:
            raise RuntimeError("diagonal available after end_assembly")
        return self._diag

    def set_solution_vector(self, x):
        self.x = x.reshape(self.n_shards, self.n_loc1, self.n_rhs)

    def _owner_plan(self):
        """Cached (shard, slot, global) index triple of every owned dof:
        ``xg[g] = xs[s, l]`` vectorizes all host gathers/scatters (no
        per-shard Python loops, ``ComputeValuesAtNodes.hpp:211-380``)."""
        plan = getattr(self, "_owner_plan_cache", None)
        if plan is None:
            g = np.concatenate(self._owned) if self._owned else np.empty(0, np.int64)
            s = np.repeat(np.arange(self.n_shards), [len(o) for o in self._owned])
            l = np.concatenate([np.arange(len(o)) for o in self._owned])
            plan = self._owner_plan_cache = (s, l, g)
        return plan

    def _update_plan(self, dof_inds: np.ndarray, slot_inds: np.ndarray):
        """Cached device-side gather plan for ``update_solution``: for each
        (node, dof) pair, the (shard, slot) of its owner in the stacked x."""
        plans = getattr(self, "_upd_plans", None)
        if plans is None:
            plans = self._upd_plans = {}
        key = (tuple(dof_inds.tolist()), tuple(slot_inds.tolist()))
        plan = plans.get(key)
        if plan is None:
            nd = self.dofmap.node_dof[:, dof_inds]  # (n_nodes, k)
            has = nd >= 0
            g = np.where(has, nd, 0)
            s = self._owner[g]
            l = np.empty_like(g)
            for p in np.unique(s):
                m = s == p
                l[m] = self._g2l_map(int(p), g[m])
            plan = plans[key] = (
                jnp.asarray(s), jnp.asarray(l), jnp.asarray(has),
                jnp.asarray(slot_inds),
            )
        return plan

    def update_solution(self, dof_inds, solution_manager, slot_inds, rhs_index: int = 0) -> None:
        dof_inds = np.asarray(list(dof_inds), dtype=np.int64)
        slot_inds = np.asarray(list(slot_inds), dtype=np.int64)
        if not self._cond_YZ:
            # device fast path: ONE jitted gather from the stacked owner slots
            # + scatter into the manager -- no host round-trip of the global
            # vector (the reference keeps this collective and local,
            # ``algsys/ComputeValuesAtNodes.hpp:211-380``)
            s, l, has, sl = self._update_plan(dof_inds, slot_inds)
            solution_manager.values = _gather_update(
                self.x, solution_manager.values, s, l, has, sl, rhs_index
            )
            return
        # condensed blocks present: interior recovery needs the per-element
        # Schur factors -- host path (vectorized global gather)
        so, lo, go = self._owner_plan()
        xs = np.asarray(self.x)[:, :, rhs_index]
        xg = np.zeros(self.n_dofs)
        xg[go] = xs[so, lo]
        nd = self.dofmap.node_dof[:, dof_inds]
        has = nd >= 0
        vals = np.where(has, xg[np.where(has, nd, 0)], 0.0)
        sm = np.array(solution_manager.values)
        sm[:, slot_inds] = vals
        # interior recovery: ui = Z - Y ub per element, from each shard's
        # stored Schur factors (``StaticCondensationManager::recoverSolution``)
        for bid, (Y, Z) in self._cond_YZ.items():
            e = self._cond_blocks[bid]
            blk, act, i_nodes = e["block"], e["act"], e["i_nodes"]
            for p in range(self.n_shards):
                sel = e["order"][p]
                if not len(sel):
                    continue
                ub = xg[e["b_dofs_g"][sel]]  # (E_p, nb)
                ui = Z[p, : len(sel), :, rhs_index] - np.einsum(
                    "eij,ej->ei", Y[p, : len(sel)], ub
                )
                nodes = blk.nodes[sel][:, i_nodes]
                vals_i = ui.reshape(len(sel), len(i_nodes), len(act))
                for di, si in zip(dof_inds, slot_inds):
                    hit = np.nonzero(act == di)[0]
                    if not len(hit):
                        continue
                    sm[nodes.reshape(-1), si] = vals_i[:, :, int(hit[0])].reshape(-1)
        solution_manager.values = jnp.asarray(sm, solution_manager.dtype)

    def _solution_global(self) -> np.ndarray:
        so, lo, go = self._owner_plan()
        xg = np.zeros((self.n_dofs, self.n_rhs))
        xg[go] = np.asarray(self.x)[so, lo]
        return xg

    def _set_solution_global(self, xg: np.ndarray) -> None:
        so, lo, go = self._owner_plan()
        xs = np.zeros((self.n_shards, self.n_loc1, self.n_rhs))
        xs[so, lo] = xg[go]
        self.x = jnp.asarray(xs, self.dtype)

    def describe(self, per_shard: bool = False) -> str:
        """One-line summary; ``per_shard=True`` appends the per-shard table
        with min/max/total footer — elements, owned/ghost dofs, halo
        send/recv widths, and local nnz where assembled (the per-rank
        system-size table analog, ``algsys/AssembledSystem.hpp:463-507``)."""
        counts = [len(o) for o in self._owned]
        head = (
            f"DistributedSystem: {self.n_dofs} dofs over {self.n_shards} shards "
            f"(owned per shard: min {min(counts)}, max {max(counts)}), "
            f"{len(self.dirichlet_dofs)} Dirichlet dofs, halo width {self._max_send}, "
            f"{self._n_neighbors} neighbor offsets (ppermute)"
        )
        from ..algsys.system import _last_solve_suffix

        head += _last_solve_suffix(self)
        if not per_shard:
            return head
        P = self.n_shards
        elems = [0] * P
        for _, blk in self.mesh.blocks():
            part = self._parts.get(id(blk))
            if part is not None:
                for p, n in zip(*np.unique(part, return_counts=True)):
                    elems[int(p)] += int(n)
        send = [0] * P
        recv = [0] * P
        for _, SI, RI, SM in self._comm:
            sm = np.asarray(SM)
            ri = np.asarray(RI)
            for p in range(P):
                send[p] += int(sm[p].sum())
                recv[p] += int((ri[p] != self._dump).sum())
        nnz = getattr(self, "_nnz_per_shard", None)
        cols = ["shard", "elems", "owned", "ghost", "send", "recv"] + (
            ["nnz"] if nnz is not None else []
        )
        rows = []
        for p in range(P):
            r = [p, elems[p], len(self._owned[p]), len(self._ghost[p]), send[p], recv[p]]
            if nnz is not None:
                r.append(nnz[p])
            rows.append(r)
        data = list(zip(*rows))  # column-major
        foot = [
            ("min", [min(c) for c in data[1:]]),
            ("max", [max(c) for c in data[1:]]),
            ("total", [sum(c) for c in data[1:]]),
        ]
        w = [max(len(h), 8) for h in cols]
        lines = [head, "  ".join(h.rjust(wi) for h, wi in zip(cols, w))]
        for r in rows:
            lines.append("  ".join(str(v).rjust(wi) for v, wi in zip(r, w)))
        for name, vals in foot:
            lines.append(
                "  ".join([name.rjust(w[0])] + [str(v).rjust(wi) for v, wi in zip(vals, w[1:])])
            )
        return "\n".join(lines)


def make_distributed_system(
    mesh,
    problem,
    bc_def=None,
    params: AlgebraicSystemParams = AlgebraicSystemParams(
        eval_strategy=OperatorEvaluationStrategy.MATRIX_FREE
    ),
    n_shards: int | None = None,
    devices=None,
    dtype=None,
    part_fractions=None,
    partition_method: str = "rcb",
    partition_grid: tuple[int, int] | None = None,
) -> DistributedSystem:
    """Factory for the sharded system (distributeMesh + makeAlgebraicSystem
    analog).  MATRIX_FREE keeps everything element-local; GLOBAL_ASSEMBLY
    builds per-shard local CSR partial matrices (the Tpetra FECrsMatrix
    analog) sharing the same halo-exchange machinery.  ``part_fractions``
    sets heterogeneous shard weights (``comm/GatherNodeThroughputs.hpp``
    analog).  ``partition_grid=(Pa, Pb)`` ranks shards on a 2D grid (RCB per
    axis, row-major ranks) so halos ride the controlled ring offsets
    {±1, ±Pb} — the multi-axis device-mesh analog of the reference's
    topology-aware re-ranking (``comm/DistributeMesh.hpp:207-227``).
    ELEMENT_BOUNDARY static condensation is supported with GLOBAL_ASSEMBLY
    (per-shard batched Schur complements,
    ``StaticCondensationManager.hpp:152-207``); matrix-free evaluation
    rejects it like ``MakeAlgebraicSystem.hpp:18-31``."""
    from ..common.enums import CondensationPolicy

    if (
        params.cond_policy != CondensationPolicy.NONE
        and params.eval_strategy != OperatorEvaluationStrategy.GLOBAL_ASSEMBLY
    ):
        raise ValueError("matrix-free evaluation cannot be combined with static condensation")
    return DistributedSystem(
        mesh, problem, bc_def, params, n_shards, devices, dtype, part_fractions,
        partition_method, partition_grid,
    )
