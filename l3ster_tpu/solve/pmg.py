"""Unstructured two-level p-multigrid preconditioner (TPU-native).

The lattice :class:`~l3ster_tpu.solve.lowordermg.LowOrderMG` only runs on
structured meshes with lex node numbering; unstructured matrix-free systems
(e.g. the Karman cylinder-in-channel mesh) were previously capped at
Jacobi/Chebyshev — the reference has the same cap for its matrix-free path
(its strong preconditioners need the assembled matrix,
``solve/Ifpack2Preconditioners.hpp:85-192``), and its matrix-BASED answer
(RILUK) is sequential-latency hostile on TPU (level-scheduled triangular
solves measured 533 ms/iter at 26k dofs).

:class:`PMultigrid` is the TPU shape of a strong unstructured
preconditioner: a two-level V-cycle whose

- **fine level** smooths with diagonally-scaled Chebyshev on the system's
  own matrix-free operator (batched MXU local applies — the fast path CG
  already uses);
- **coarse level** is the SAME least-squares kernels rediscretized at Q1 on
  the corner-vertex mesh (:func:`~l3ster_tpu.mesh.convert_order
  .extract_q1_mesh`), assembled once per (lagged) epoch, eliminated, and
  inverted ON HOST into a dense matrix — the coarse solve is then a single
  (n_c, n_c) @ (n_c, m) matmul per application: MXU food, no triangular
  solves, no scalar gathers (n_c = n_dofs / p^dim, e.g. 26k -> 3k for the
  Karman p=3 mesh, a 36 MB f32 operand);
- **transfers** are geometry-free Q1 interpolation in reference coordinates:
  every fine GLL node takes a fixed 2^dim-corner weight row (exact for the
  isoparametric Q1 map), applied as node-row gathers/scatter-adds so the
  per-apply cost rides the ~1.1 ms / 74k-row TPU gather bound, not scalar
  traffic.

For transient/nonlinear stepping set ``lag=k`` to freeze the coarse factor
across k reassemblies (the host dense inverse is the only per-refresh cost).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .lowordermg import _cheb

__all__ = ["PMultigrid"]


def _q1_weights(ref: np.ndarray) -> np.ndarray:
    """(n_nodes, 2^dim) multilinear corner weights at reference coords
    (corners in vertex/lexicographic order: bit a of corner k = axis a)."""
    n, dim = ref.shape
    K = 1 << dim
    w = np.ones((n, K))
    for a in range(dim):
        bits = (np.arange(K) >> a) & 1
        w1 = np.stack([(1.0 - ref[:, a]) / 2.0, (1.0 + ref[:, a]) / 2.0], axis=1)
        w *= w1[:, bits]
    return w


def _build_transfers(mesh, remap: np.ndarray):
    """Per-fine-node prolongation stencil: (nbr, wts) with nbr (n_f, 2^dim)
    coarse node ids and wts the Q1 corner weights, taken from the first
    volume element containing each node (conforming Q1 interp is single-
    valued on shared faces, so the choice of owner is immaterial)."""
    from ..mesh.traits import corner_lattice_indices, reference_node_coords

    dim = mesh.dim
    K = 1 << dim
    nbr = np.zeros((mesh.n_nodes, K), dtype=np.int64)
    wts = np.zeros((mesh.n_nodes, K))
    seen = np.zeros(mesh.n_nodes, dtype=bool)
    for did, blk in mesh.blocks():
        if blk.dim != dim or did in mesh.boundary_ids:
            continue
        ref = reference_node_coords(blk.element_type, blk.order)
        w = _q1_weights(ref)  # (n_nodes_el, K)
        cids = remap[blk.nodes[:, corner_lattice_indices(blk.element_type, blk.order)]]
        flat = blk.nodes.reshape(-1)
        uniq, first = np.unique(flat, return_index=True)
        fresh = ~seen[uniq]
        uniq, first = uniq[fresh], first[fresh]
        e, n = np.divmod(first, blk.nodes.shape[1])
        nbr[uniq] = cids[e]
        wts[uniq] = w[n]
        seen[uniq] = True
    if not seen.all():
        raise ValueError(
            "PMultigrid: some mesh nodes appear in no volume element "
            f"({int((~seen).sum())} uncovered)"
        )
    return nbr, wts


def _restricted_field_access(fa, fine_ids: np.ndarray):
    from ..post.solution import FieldAccess

    return FieldAccess(values=fa.values[jnp.asarray(fine_ids)], slots=fa.slots)


def _make_coarse_system(system, mesh1, max_dofs: int):
    import l3ster_tpu as lt

    from ..common.enums import OperatorEvaluationStrategy
    from ..common.problem import AlgebraicSystemParams

    params = AlgebraicSystemParams(
        eval_strategy=OperatorEvaluationStrategy.GLOBAL_ASSEMBLY, n_rhs=1
    )
    # coarse assembly in the system dtype (f64 needs x64, unavailable on TPU);
    # the dense inversion below always runs in host f64
    dtype = jnp.float64 if jax.config.jax_enable_x64 else system.dtype
    s1 = lt.make_algebraic_system(mesh1, system.problem, system.bc_def, params, dtype=dtype)
    if s1.n_dofs > max_dofs:
        raise ValueError(
            f"PMultigrid coarse level has {s1.n_dofs} dofs > coarse_max_dofs="
            f"{max_dofs}; the dense inverse would need "
            f"{s1.n_dofs * s1.n_dofs * 4 / 2**20:.0f} MB — raise coarse_max_dofs "
            "or use a finer-grained preconditioner"
        )
    return s1


def _coarse_dense_inv(system, s1, fine_ids: np.ndarray):
    """(Re-)assemble the fine system's operator kernels at Q1 on the
    extracted mesh, eliminate, and invert on host (f64) — the coarse level.
    ``s1`` is reused across refreshes so its assembly programs stay compiled.

    The WHOLE refresh runs on the host CPU backend (``host_setup``): the Q1
    assembly is ~1.5k tiny elements whose jitted local pass costs seconds of
    remote-TPU dispatch/readback through the tunnel but milliseconds locally
    (measured 5.7 s -> ~0.2 s of a 15.9 s refresh, 2026-08-20), and the
    result is consumed by the host LAPACK inversion anyway."""
    from ..utils.hostmath import host_setup
    from ..utils.profiling import profile_region

    with host_setup():
        with profile_region("pmg/coarse_assembly"):
            s1.begin_assembly()
            for c in system._contribs:
                # DistributedSystem holds _ShardBuckets; their .src is the
                # original global _Contribution carrying domain/boundary ids
                c = getattr(c, "src", None) or c
                if c.mode == "rhs":
                    continue
                fa = c.field_access[0] if c.field_access is not None else None
                if fa is not None:
                    fa = _restricted_field_access(fa, fine_ids)
                rid = c.boundary_id if c.boundary_id is not None else c.domain_id
                s1.assemble_problem(
                    c.kernel, [rid], field_access=fa, dof_inds=c.dof_inds,
                    time=c.time, mode="operator",
                )
            s1.end_assembly()
        with profile_region("pmg/coarse_csr"):
            data, indices, indptr, n = s1.eliminated_csr()
            dense = np.zeros((n, n))
            rows = np.repeat(np.arange(n), np.diff(np.asarray(indptr)))
            dense[rows, np.asarray(indices)] = np.asarray(data, np.float64)
    with profile_region("pmg/coarse_inverse"):
        try:  # torch's LAPACK build inverts ~3x faster than numpy's on this class
            import torch

            return torch.linalg.inv(torch.from_numpy(dense)).numpy()
        except ImportError:  # pragma: no cover
            return np.linalg.inv(dense)


@dataclass(frozen=True)
class PMultigrid:
    """Unstructured p->1 two-level V-cycle preconditioner (see module doc).

    ``smooth_degree`` is the Chebyshev post-smoothing degree; ``pre_degree``
    the pre-smoothing degree (None -> symmetric V(k,k)).  WARNING: unlike
    the lattice LowOrderMG (whose level-0 coarsening is mild), ``pre_degree=0``
    makes M nonsymmetric across a genuinely coarse correction and CG was
    MEASURED to diverge with it on the cylinder mesh (2026-08-19) — keep
    V(k,k) for CG; V(0,k) only with GMRES.  ``lag=k`` freezes the whole
    refresh (coarse inverse, smoother scaling, lambda_max) across up to k
    reassemblies (transient stepping).  Freeze only across solves of the
    SAME operator family: a coarse factor frozen from e.g. a steady Picard
    operator mispreconditions the transient (mass-term) operator badly
    (measured 2048-iter cap vs 113 after refresh, 2026-08-19) — warm up
    with Jacobi, or use a separate PMultigrid instance per operator.
    """

    smooth_degree: int = 2
    pre_degree: int | None = None
    cycles: int = 1
    # int k: refresh every k+1 reassemblies; "auto": freeze until the solver
    # observes iteration counts degrade past refresh_ratio x the post-refresh
    # baseline (solve/krylov._note_precond_iters) -- for slowly-drifting
    # transient operators this amortizes the coarse refresh over arbitrarily
    # many steps
    lag: int | str = 0
    refresh_ratio: float = 1.35
    coarse_max_dofs: int = 12000
    eig_ratio: float = 8.0

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def setup_parts(self, system, layout: str = "dof"):
        """Refresh-stable parts: the ``apply`` closure (and the jitted power
        iteration) are cached on the system keyed by (self, operator-fn
        identity), so lagged refreshes in transient stepping return the SAME
        fn object with new consts — the solver's jitted program then hits the
        jax trace cache instead of re-tracing the whole V-cycle each refresh
        (the operator fn itself is structurally cached across reassemblies,
        see ``MatrixFreeSystem.operator_parts``).  All refreshed values —
        operator tensors, D^-1, lambda_max, the coarse dense inverse — ride
        in consts."""
        if layout != "dof":
            raise ValueError("PMultigrid runs on dof-major vectors (unstructured meshes)")
        if hasattr(system, "_shard_apply_pieces"):  # DistributedSystem
            return self._setup_parts_distributed(system)
        fn, oc = system.operator_parts()
        cache = getattr(system, "_pmg_static_cache", None)
        if cache is None:
            cache = system._pmg_static_cache = {}
        st = cache.get(self)
        if st is None or st["fn"] is not fn or st["n_oc"] != len(oc):
            st = cache[self] = self._build_static(system, fn, len(oc))

        # per-refresh values (everything the operator's current values touch)
        from ..utils.profiling import profile_region

        dtype = system.dtype
        Binv_np = _coarse_dense_inv(system, st["s1"], st["fine_ids"])
        with profile_region("pmg/power_iteration"):
            d = system.diagonal()
            dinv = jnp.where(jnp.abs(d) > 1e-14, 1.0 / d, 1.0)
            lam_max = float(st["power"](dinv, *oc)) * 1.05
        # the coarse inverse ships in the SYSTEM dtype: a bf16 Binv (halved
        # upload) was tried and REJECTED -- it stalls CG at the 2048-iter cap
        # (2026-08-20): the 0.4%-rounded inverse of the ill-conditioned coarse
        # operator loses the SPD/consistency CG needs at tol 1e-6
        consts = (
            *oc,
            dinv,
            system.free_mask,
            jnp.asarray(lam_max, dtype),
            st["nbr"],
            jnp.asarray(Binv_np, dtype),
        )
        return st["apply"], consts

    def _build_static(self, system, fn, n_oc: int):
        from ..mesh.convert_order import extract_q1_mesh

        mesh = system.mesh
        dtype = system.dtype
        n_nodes = mesh.n_nodes
        n_unk = system.n_dofs // n_nodes
        if n_unk * n_nodes != system.n_dofs:
            raise ValueError("PMultigrid requires uniform dofs per node")

        mesh1, fine_ids = extract_q1_mesh(mesh)
        remap = np.full(n_nodes, -1, dtype=np.int64)
        remap[fine_ids] = np.arange(len(fine_ids), dtype=np.int64)
        nbr_np, wts_np = _build_transfers(mesh, remap)
        s1 = _make_coarse_system(system, mesh1, self.coarse_max_dofs)
        n_cnodes = len(fine_ids)
        if s1.n_dofs != n_cnodes * n_unk:
            raise ValueError("PMultigrid requires uniform dofs per node on the coarse mesh")

        # lambda_max of D^-1 A by power iteration (refresh-time, on device)
        v0 = jax.random.normal(jax.random.PRNGKey(0), (system.n_dofs, 1), dtype=dtype)

        @jax.jit
        def power(dinv, *ocs):
            def step(_, v):
                w = dinv[:, None] * fn(v, *ocs)
                return w / jnp.linalg.norm(w)

            v = jax.lax.fori_loop(0, 15, step, v0)
            w = dinv[:, None] * fn(v, *ocs)
            return jnp.vdot(v, w) / jnp.vdot(v, v)

        nbr = jnp.asarray(nbr_np, jnp.int32)
        wts = jnp.asarray(wts_np, dtype)  # static Q1 stencil: baked, not a const
        pre_degree = self.pre_degree if self.pre_degree is not None else self.smooth_degree
        smooth_degree = self.smooth_degree
        cycles = self.cycles
        eig_ratio = self.eig_ratio

        def restrict(rf, nbr):
            # rf (n_fdofs, m) node-major -> coarse via the transposed stencil
            m = rf.shape[1]
            r3 = rf.reshape(n_nodes, n_unk, m)
            contrib = wts[:, :, None, None] * r3[:, None, :, :]  # (n_f, K, u, m)
            out = jnp.zeros((n_cnodes, n_unk, m), rf.dtype).at[nbr].add(contrib)
            return out.reshape(n_cnodes * n_unk, m)

        def prolong(zc, nbr):
            m = zc.shape[1]
            z3 = zc.reshape(n_cnodes, n_unk, m)
            g = z3[nbr]  # (n_f, K, u, m) node-row gathers
            out = jnp.einsum("fk,fkum->fum", wts, g)
            return out.reshape(n_nodes * n_unk, m)

        def apply(r, *cs):
            ocs = cs[:n_oc]
            dinv = cs[n_oc]
            free = cs[n_oc + 1]
            lam_max = cs[n_oc + 2]
            nbr = cs[n_oc + 3]
            Binv = cs[n_oc + 4]

            def vcycle(r_l):
                if pre_degree > 0:
                    z = _cheb(
                        fn, r_l, jnp.zeros_like(r_l), dinv, lam_max, ocs,
                        pre_degree, eig_ratio, z0_zero=True,
                    )
                    rc = r_l - fn(z, *ocs)
                else:
                    z = jnp.zeros_like(r_l)
                    rc = r_l
                rcc = restrict(rc * free[:, None], nbr)
                # Binv is system-dtype (bf16 was tried and rejected: it stalls
                # CG -- see setup_parts); likewise never round rcc itself, a
                # rounded RESIDUAL makes M(r) nonlinear (measured: 2048-iter
                # cap, 2026-08-20)
                zc = jnp.matmul(Binv, rcc)
                z = z + prolong(zc, nbr) * free[:, None]
                return _cheb(fn, r_l, z, dinv, lam_max, ocs, smooth_degree, eig_ratio)

            z = vcycle(r)
            for _ in range(cycles - 1):
                z = z + vcycle(r - fn(z, *ocs))
            return z

        return dict(
            fn=fn, n_oc=n_oc, apply=apply, power=power, s1=s1,
            fine_ids=fine_ids, nbr=nbr,
        )

    # -- distributed (multi-chip) path ----------------------------------------
    #
    # The V-cycle runs INSIDE one shard_map program (the reference's whole
    # preconditioner suite is MPI-native, ``solve/Ifpack2Preconditioners
    # .hpp:85-192``; here the parallelism is the device mesh):
    #
    # - smoothing calls the system's per-shard operator fn (halo ppermutes
    #   ride the existing ring-offset pattern);
    # - restriction scatters each shard's OWNED fine residual rows into the
    #   coarse vector via a per-shard Q1 stencil and ``psum``s the result, so
    #   every shard holds the REPLICATED coarse residual;
    # - the coarse solve is the replicated dense ``Binv @ rcc`` matmul on each
    #   shard (the coarse level is <= coarse_max_dofs — replicating beats
    #   sharding a matrix this small);
    # - prolongation gathers from the replicated coarse correction back to the
    #   shard's local rows (ghost slots need no correction: every operator
    #   apply re-imports them from their owners).

    def _setup_parts_distributed(self, system):
        from jax.sharding import PartitionSpec as P

        from ..utils.profiling import profile_region

        dtype = system.dtype
        cache = getattr(system, "_pmg_static_cache", None)
        if cache is None:
            cache = system._pmg_static_cache = {}
        st = cache.get(self)
        if st is None:
            st = cache[self] = self._build_static_distributed(system)

        inner, arrays, flags, sig = system._shard_apply_pieces(constrained=True)
        if st.get("sig") != sig:
            # (re)trace the V-cycle program for this operator structure; later
            # epochs of identical structure reuse it with fresh arrays
            st["sig"] = sig
            st["apply"] = self._build_apply_distributed(system, st, inner, flags)

        Binv_np = _coarse_dense_inv(system, st["s1"], st["fine_ids"])
        fn, oc = system.operator_parts()
        with profile_region("pmg/power_iteration"):
            d = system.diagonal()
            dinv = jnp.where(jnp.abs(d) > 1e-14, 1.0 / d, 1.0)
            lam_max = float(st["power"](fn, dinv, *oc)) * 1.05
        consts = (
            system._free_local,
            system._dir_local,
            system._owned_mask,
            *system._comm_arrays(),
            *arrays,
            dinv,
            jnp.asarray(lam_max, dtype),
            st["cnb"],
            st["cwt"],
            jnp.asarray(Binv_np, dtype),  # f32 Binv: bf16 rejected, see above
        )
        return st["apply"], consts

    def _build_static_distributed(self, system):
        from ..mesh.convert_order import extract_q1_mesh

        mesh = system.mesh
        dtype = system.dtype
        n_nodes = mesh.n_nodes
        n_unk = system.n_dofs // n_nodes
        if n_unk * n_nodes != system.n_dofs:
            raise ValueError("PMultigrid requires uniform dofs per node")

        mesh1, fine_ids = extract_q1_mesh(mesh)
        remap = np.full(n_nodes, -1, dtype=np.int64)
        remap[fine_ids] = np.arange(len(fine_ids), dtype=np.int64)
        nbr_np, wts_np = _build_transfers(mesh, remap)  # (n_nodes, K) global
        s1 = _make_coarse_system(system, mesh1, self.coarse_max_dofs)
        n_cnodes = len(fine_ids)
        if s1.n_dofs != n_cnodes * n_unk:
            raise ValueError("PMultigrid requires uniform dofs per node on the coarse mesh")

        # per-shard stencils over local dof slots [owned | ghost | dump]:
        # coarse DOF ids (node-major: cnode * n_unk + unk) and Q1 weights,
        # with weights zeroed outside the OWNED segment so the psum'd
        # restriction counts every fine dof exactly once
        Pn, L = system.n_shards, system.n_loc1
        K = nbr_np.shape[1]
        cnb = np.zeros((Pn, L, K), dtype=np.int64)
        cwt = np.zeros((Pn, L, K))
        for p in range(Pn):
            own = system._owned[p]
            if not len(own):
                continue
            node, unk = own // n_unk, own % n_unk
            cnb[p, : len(own)] = nbr_np[node] * n_unk + unk[:, None]
            cwt[p, : len(own)] = wts_np[node]

        def power(fn, dinv, *ocs):
            # lambda_max of D^-1 A on the sharded operator (jitted per fn
            # identity via the system's operator cache — fn is an argument,
            # not a closure, so epochs reuse one trace when fn is stable)
            v0 = jax.random.normal(
                jax.random.PRNGKey(0), (Pn, L, 1), dtype=dtype
            )

            def step(_, v):
                w = dinv[..., None] * fn(v, *ocs)
                return w / jnp.linalg.norm(w)

            v = jax.lax.fori_loop(0, 15, step, v0)
            w = dinv[..., None] * fn(v, *ocs)
            return jnp.vdot(v, w) / jnp.vdot(v, v)

        return dict(
            s1=s1,
            fine_ids=fine_ids,
            n_cdofs=n_cnodes * n_unk,
            cnb=jnp.asarray(cnb, jnp.int32),
            cwt=jnp.asarray(cwt, dtype),
            power=jax.jit(power, static_argnums=0),
            sig=None,
            apply=None,
        )

    def _build_apply_distributed(self, system, st, inner, flags):
        from jax.sharding import PartitionSpec as P

        n_comm = 3 * system._n_neighbors
        n_op = len(flags)
        n_cdofs = st["n_cdofs"]
        pre_degree = self.pre_degree if self.pre_degree is not None else self.smooth_degree
        smooth_degree = self.smooth_degree
        cycles = self.cycles
        eig_ratio = self.eig_ratio

        def fn_v(r, free_l, dir_l, owned_l, *rest):
            comm_op = rest[: n_comm + n_op]
            dinv1, lam_max, cnb1, cwt1, Binv = rest[n_comm + n_op :]
            r0 = r[0]  # (L, m)
            free = free_l[0]
            owned = owned_l[0]
            dinv = dinv1[0]
            cnb = cnb1[0]  # (L, K)
            cwt = cwt1[0]

            def op(v, *_):  # (L, m) -> owned-masked (L, m); halos inside
                return inner(v[None], free_l, dir_l, owned_l, *comm_op)[0]

            def restrict(rf):
                contrib = cwt[:, :, None] * rf[:, None, :]  # (L, K, m)
                rc = jnp.zeros((n_cdofs, rf.shape[1]), rf.dtype).at[cnb].add(contrib)
                return jax.lax.psum(rc, "shards")  # replicated coarse residual

            def prolong(zc):
                return jnp.einsum("lk,lkm->lm", cwt, zc[cnb])

            def vcycle(r_l):
                if pre_degree > 0:
                    z = _cheb(
                        op, r_l, jnp.zeros_like(r_l), dinv, lam_max, (),
                        pre_degree, eig_ratio, z0_zero=True,
                    )
                    rc = r_l - op(z)
                else:
                    z = jnp.zeros_like(r_l)
                    rc = r_l
                rcc = restrict(rc * free[:, None])
                zc = jnp.matmul(Binv, rcc)
                z = z + prolong(zc) * free[:, None]
                return _cheb(op, r_l, z, dinv, lam_max, (), smooth_degree, eig_ratio)

            z = vcycle(r0)
            for _ in range(cycles - 1):
                z = z + vcycle(r0 - op(z))
            # ghost slots must return ZERO (CG dot products reduce over the
            # whole stacked layout; only owned rows may contribute)
            return (z * owned[:, None])[None]

        specs = (
            (P("shards"),) * (4 + n_comm)
            + tuple(P("shards") if f else P() for f in flags)
            + (P("shards"), P(), P("shards"), P("shards"), P())
        )
        sharded = jax.shard_map(
            fn_v, mesh=system.device_mesh, in_specs=specs, out_specs=P("shards")
        )
        return lambda r, *cs: sharded(r, *cs)
