"""Low-order-rediscretized geometric multigrid preconditioner (TPU-native).

The reference caps matrix-free solves at Jacobi/Chebyshev (its strong
preconditioners — RILUK et al., ``solve/Ifpack2Preconditioners.hpp:85-192``
— need the assembled matrix).  This module is the TPU-native answer for the
matrix-free/lattice fast path: precondition the order-p LSFEM normal
equations with the SAME least-squares kernel rediscretized at p=1 on the GLL
node lattice (the classical FEM-SEM spectral-equivalence trick), and solve
the low-order system approximately with a geometric V-cycle:

- every level is a full l3ster system (order-1 elements on a sub-lattice of
  the GLL nodes) assembled by REPLAYING the fine system's kernel
  contributions, so the hierarchy picks up the lattice fast path (fused
  Pallas z-sweep, diagonal-geometry kernels) automatically;
- transfer operators are 1D linear-interpolation bands tensor-produced over
  the lattice axes (three small matmuls per application — MXU food);
- smoothing is diagonally-scaled Chebyshev (lambda_max by power iteration at
  setup), the coarsest level is a precomputed dense inverse (host-side
  factorization; no LU runs on device).

Works for systems whose volume discretization lives on a structured lattice
with lattice node numbering (every ``generate_mesh(make_cube/square_mesh)``
product) and whose boundary ids follow the generator defaults.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LowOrderMG"]


def _axis_coords(mesh):
    """Per-axis sorted coordinates of a lattice mesh + lex-order check."""
    nc = np.asarray(mesh.node_coords)
    dim = mesh.dim
    axes = []
    for a in range(dim):
        axes.append(np.unique(np.round(nc[:, a], 12)))
    if int(np.prod([len(a) for a in axes])) != mesh.n_nodes:
        return None
    # verify lex (x fastest) numbering
    grids = np.meshgrid(*reversed(axes), indexing="ij")  # (z, y, x) order
    rec = np.stack([g.reshape(-1) for g in reversed(grids)], axis=1)
    if not np.allclose(rec, nc[:, :dim], atol=1e-10):
        return None
    return axes


def _perm_to_lat(v, n_rows: int, n_unk: int):
    """dof-major (node*n_unk+u) rows -> channel-major (u*n_rows+node)."""
    v2 = v[:, None] if v.ndim == 1 else v
    out = v2.reshape(n_rows, n_unk, v2.shape[1]).transpose(1, 0, 2).reshape(v2.shape)
    return out[:, 0] if v.ndim == 1 else out


def _perm_from_lat(v, n_rows: int, n_unk: int):
    v2 = v[:, None] if v.ndim == 1 else v
    out = v2.reshape(n_unk, n_rows, v2.shape[1]).transpose(1, 0, 2).reshape(v2.shape)
    return out[:, 0] if v.ndim == 1 else out


def _coarsen(idx: np.ndarray) -> np.ndarray:
    """Every-2nd-node coarsening keeping both endpoints."""
    n = len(idx)
    keep = list(range(0, n, 2))
    if keep[-1] != n - 1:
        keep.append(n - 1)
    return idx[np.asarray(keep)]


def _interp_1d(fine: np.ndarray, coarse: np.ndarray) -> np.ndarray:
    """P (n_fine, n_coarse): piecewise-linear interpolation weights."""
    nf, ncr = len(fine), len(coarse)
    P = np.zeros((nf, ncr))
    seg = np.clip(np.searchsorted(coarse, fine, side="right") - 1, 0, ncr - 2)
    x0, x1 = coarse[seg], coarse[seg + 1]
    t = np.where(x1 > x0, (fine - x0) / np.where(x1 > x0, x1 - x0, 1.0), 0.0)
    P[np.arange(nf), seg] = 1.0 - t
    P[np.arange(nf), seg + 1] = t
    return P


def _cheb(fn_l, r, z0, dinv, lam_max, ocs, degree, eig_ratio, z0_zero=False):
    """Chebyshev iteration on D^-1 A of the given degree, starting from z0
    (standard smoothing recurrence).  ``z0_zero`` skips the first operator
    apply (the defect of a zero iterate is r).  Broadcasting is layout-
    agnostic: vectors may be single-chip (n, m) or box-stacked (P, L, m) with
    dinv of matching leading shape."""
    if degree <= 0:
        return z0
    lmax = lam_max
    lmin = lmax / eig_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    z = z0
    resid = dinv[..., None] * (r if z0_zero else r - fn_l(z, *ocs))
    p = resid / theta
    z = z + p
    rho = delta / theta
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * theta / delta - rho)
        resid = dinv[..., None] * (r - fn_l(z, *ocs))
        p = rho_new * (2.0 / delta * resid + rho * p)
        z = z + p
        rho = rho_new
    return z


def _build_p1_system(system, axes, dtype):
    """Assemble the fine problem's kernels at order 1 on the given lattice."""
    import l3ster_tpu as lt

    dim = system.mesh.dim
    if dim == 3:
        base = lt.make_cube_mesh(axes[0], axes[1], axes[2])
    elif dim == 2:
        base = lt.make_square_mesh(axes[0], axes[1])
    else:
        raise ValueError("LowOrderMG supports 2D/3D lattice meshes")
    mesh1 = lt.generate_mesh(base, order=1)
    from ..common.enums import OperatorEvaluationStrategy
    from ..common.problem import AlgebraicSystemParams

    params = AlgebraicSystemParams(
        eval_strategy=OperatorEvaluationStrategy.MATRIX_FREE, n_rhs=1
    )
    s1 = lt.make_algebraic_system(mesh1, system.problem, system.bc_def, params, dtype=dtype)
    missing = [
        rid
        for c in system._contribs
        for rid in [c.boundary_id if c.boundary_id is not None else c.domain_id]
        if rid not in s1.mesh.domains
    ]
    if missing:
        raise ValueError(
            f"LowOrderMG: fine-system domain ids {sorted(set(missing))} not present "
            "on the generated low-order mesh (custom boundary ids are unsupported)"
        )
    s1.begin_assembly()
    for c in system._contribs:
        if c.mode == "rhs":
            continue
        fa = c.field_access[0] if c.field_access is not None else None
        rid = c.boundary_id if c.boundary_id is not None else c.domain_id
        s1.assemble_problem(
            c.kernel, [rid], field_access=fa, dof_inds=c.dof_inds,
            time=c.time, mode="operator",
        )
    s1.end_assembly()
    return s1


def _assembled_dense_inv(system, axes, dtype):
    """Coarsest level: dense inverse of the eliminated p1 matrix (host)."""
    import l3ster_tpu as lt

    dim = system.mesh.dim
    if dim == 3:
        base = lt.make_cube_mesh(axes[0], axes[1], axes[2])
    else:
        base = lt.make_square_mesh(axes[0], axes[1])
    mesh1 = lt.generate_mesh(base, order=1)
    from ..common.enums import OperatorEvaluationStrategy
    from ..common.problem import AlgebraicSystemParams

    params = AlgebraicSystemParams(
        eval_strategy=OperatorEvaluationStrategy.GLOBAL_ASSEMBLY, n_rhs=1
    )
    s1 = lt.make_algebraic_system(mesh1, system.problem, system.bc_def, params, dtype=dtype)
    s1.begin_assembly()
    for c in system._contribs:
        if c.mode == "rhs":
            continue
        fa = c.field_access[0] if c.field_access is not None else None
        rid = c.boundary_id if c.boundary_id is not None else c.domain_id
        s1.assemble_problem(
            c.kernel, [rid], field_access=fa, dof_inds=c.dof_inds,
            time=c.time, mode="operator",
        )
    s1.end_assembly()
    data, indices, indptr, n = s1.eliminated_csr()
    dense = np.zeros((n, n))
    rows = np.repeat(np.arange(n), np.diff(np.asarray(indptr)))
    dense[rows, np.asarray(indices)] = np.asarray(data)
    return np.linalg.inv(dense)


@dataclass(frozen=True)
class LowOrderMG:
    """p->1 rediscretization + geometric V-cycle preconditioner.

    ``n_levels`` counts lattice levels including the fine GLL lattice
    (level 0 is order-1 elements on ALL GLL nodes); the coarsest level is a
    dense inverse.  ``smooth_degree`` is the Chebyshev smoothing degree per
    pre/post sweep; ``cycles`` stacks V-cycles per application.
    """

    n_levels: int = 3
    smooth_degree: int = 2
    pre_degree: int | None = None  # pre-smoothing degree; None -> smooth_degree.
    # V(0,k) cycles (pre_degree=0) skip BOTH pre-smoothing applies and the
    # defect apply (the defect of a zero iterate is r itself) — at the p=6
    # flagship this turns 5 level-0 p1-operator applies per V-cycle into 2.
    cycles: int = 1
    fine_level0: bool | None = None  # None -> auto (True for matrix-free systems).
    # Smooth level 0 with the FINE order-p operator instead of a p=1
    # rediscretization on the full GLL lattice.  The p1-on-GLL operator's QP
    # space is (2*p*ne)^d — at the p=6 flagship 72^3 = 5x the fine operator's
    # 42^3 — so one "cheap" low-order smoothing apply costs MORE than the
    # 0.21ms fused fine apply.  Using the fine operator makes the V-cycle a
    # true MG cycle on A itself (p1 levels only below the first coarsening)
    # and skips assembling the big p1-on-GLL level at setup.
    lag: int = 0  # reuse the hierarchy across up to `lag` reassemblies
    coarse_max_dofs: int = 4000
    eig_ratio: float = 8.0
    # channel-major vectors supported end-to-end: level operators run
    # ``operator_parts(layout="lattice")`` where available (falling back to
    # per-apply permutations), transfers consume the channel-leading tensor
    # view directly, and the coarse dense inverse is permuted at setup
    supports_lattice_layout = True

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def setup_parts(self, system, layout: str = "dof"):
        from ..parallel.box import BoxSystem

        if isinstance(system, BoxSystem):
            if layout != "dof":
                raise ValueError("box LowOrderMG runs on the stacked window layout")
            return self._setup_parts_box(system)
        if hasattr(system, "_shard_apply_pieces"):  # DistributedSystem
            raise ValueError(
                "LowOrderMG needs a structured lattice; on multiple chips use "
                "box_parallelize(system, ...) (window-decomposed LowOrderMG, "
                "the intended pairing for structured meshes) or "
                "PMultigrid (distributed-native, any mesh)"
            )
        lat = layout == "lattice"
        axes = _axis_coords(system.mesh)
        if axes is None:
            raise ValueError(
                "LowOrderMG requires a structured lattice mesh with lex node numbering"
            )
        dtype = system.dtype
        dim = system.mesh.dim
        n_unk = system.n_dofs // system.mesh.n_nodes
        if n_unk * system.mesh.n_nodes != system.n_dofs:
            raise ValueError("LowOrderMG requires uniform dofs per node")

        # lattice hierarchy (axis index subsets)
        level_axes = [axes]
        while len(level_axes) < self.n_levels:
            cand = [_coarsen(a) for a in level_axes[-1]]
            ndofs = int(np.prod([len(a) for a in cand])) * n_unk
            level_axes.append(cand)
            if ndofs <= self.coarse_max_dofs:
                break
        # coarsen further until the dense inverse is affordable
        while int(np.prod([len(a) for a in level_axes[-1]])) * n_unk > self.coarse_max_dofs:
            if all(len(a) <= 2 for a in level_axes[-1]):
                break
            level_axes.append([_coarsen(a) for a in level_axes[-1]])

        # per-level operators (all but the coarsest) with Chebyshev params.
        # EVERY level is an order-1 rediscretization (level 0 = p1 elements on
        # the full GLL lattice); the fine order-p operator is never applied
        # inside the preconditioner — CG already applies it once per
        # iteration, and A_1 is spectrally equivalent (FEM-SEM).
        levels = []
        consts: list = []
        fine0 = self.fine_level0
        if fine0 is None:
            from ..algsys.system import MatrixFreeSystem

            # auto: the fine operator is cheaper than p1-on-GLL only on the
            # matrix-free fast path; assembled systems keep the rediscretized
            # level 0 (their per-apply SpMV is gather-bound on TPU)
            fine0 = isinstance(system, MatrixFreeSystem)
        for li, ax in enumerate(level_axes[:-1]):
            s_l = system if (li == 0 and fine0) else _build_p1_system(system, ax, dtype)
            n_rows_l = s_l.n_dofs // n_unk
            if lat:
                try:
                    fn, oc = s_l.operator_parts(layout="lattice")
                except ValueError:
                    # level operator lacks the lattice fast path (e.g. CPU
                    # sum-fact buckets): permute per apply instead
                    fn_dof, oc = s_l.operator_parts()

                    def fn(x, *ocs, _f=fn_dof, _n=n_rows_l):
                        return _perm_to_lat(_f(_perm_from_lat(x, _n, n_unk), *ocs), _n, n_unk)

            else:
                fn, oc = s_l.operator_parts()
            d_l = s_l.diagonal()
            dinv = jnp.where(jnp.abs(d_l) > 1e-14, 1.0 / d_l, 1.0)
            if lat:
                dinv = _perm_to_lat(dinv, n_rows_l, n_unk)
            # lambda_max of D^-1 A by power iteration (setup-time, on device)
            key = jax.random.PRNGKey(li)
            v = jax.random.normal(key, (s_l.n_dofs, 1), dtype=dtype)

            @jax.jit
            def power(v, dinv, *ocs):
                def step(_, v):
                    w = dinv[:, None] * fn(v, *ocs)
                    return w / jnp.linalg.norm(w)

                v = jax.lax.fori_loop(0, 15, step, v)
                w = dinv[:, None] * fn(v, *ocs)
                return jnp.vdot(v, w) / jnp.vdot(v, v)

            lam = float(power(v, dinv, *oc)) * 1.05
            free_l = s_l.free_mask
            if lat:
                free_l = _perm_to_lat(free_l, n_rows_l, n_unk)
            levels.append(
                dict(
                    fn=fn, off=len(consts), n_oc=len(oc),
                    lam_max=lam, n_dofs=s_l.n_dofs,
                )
            )
            consts.extend(oc)
            levels[-1]["dinv_pos"] = len(consts)
            consts.append(dinv)
            consts.append(free_l)
            # transfer to the next level: per-axis linear interpolation bands
            Ps = [
                jnp.asarray(_interp_1d(fa, ca), dtype)
                for fa, ca in zip(ax, level_axes[li + 1])
            ]
            levels[-1]["P_pos"] = len(consts)
            consts.extend(Ps)

        Binv = _assembled_dense_inv(system, level_axes[-1], dtype)
        if lat:
            # permute the dense inverse into channel-major indexing once
            n_rows_c = Binv.shape[0] // n_unk
            dof_of_lat = (
                np.arange(n_rows_c)[None, :] * n_unk + np.arange(n_unk)[:, None]
            ).ravel()
            Binv = Binv[np.ix_(dof_of_lat, dof_of_lat)]
        coarse_pos = len(consts)
        consts.append(jnp.asarray(Binv, dtype))
        smooth_degree = self.smooth_degree
        pre_degree = self.pre_degree if self.pre_degree is not None else self.smooth_degree
        cycles = self.cycles
        eig_ratio = self.eig_ratio
        n_levels = len(levels)

        def cheb(fn_l, r, z0, dinv, lam_max, ocs, degree, z0_zero=False):
            return _cheb(fn_l, r, z0, dinv, lam_max, ocs, degree, eig_ratio, z0_zero)

        def restrict(x, Ps, n_unk):
            # x (n_f, m) -> coarse via P^T per axis, channel-leading tensors
            shp_f = tuple(P.shape[0] for P in reversed(Ps))  # (z, y, x)
            m = x.shape[1]
            if lat:
                # channel-major rows: the tensor view is free; m rides as a
                # trailing axis through the per-axis band matmuls
                t = x.reshape((n_unk,) + shp_f + (m,))
                if len(Ps) == 3:
                    t = jnp.einsum("czyxm,xX->czyXm", t, Ps[0])
                    t = jnp.einsum("czyXm,yY->czYXm", t, Ps[1])
                    t = jnp.einsum("czYXm,zZ->cZYXm", t, Ps[2])
                else:
                    t = jnp.einsum("cyxm,xX->cyXm", t, Ps[0])
                    t = jnp.einsum("cyXm,yY->cYXm", t, Ps[1])
                return t.reshape(-1, m)
            t = x.reshape(shp_f + (n_unk * m,))
            t = jnp.moveaxis(t, -1, 0)  # (c*m, z, y, x)
            if len(Ps) == 3:
                t = jnp.einsum("czyx,xX->czyX", t, Ps[0])
                t = jnp.einsum("czyX,yY->czYX", t, Ps[1])
                t = jnp.einsum("czYX,zZ->cZYX", t, Ps[2])
            else:
                t = jnp.einsum("cyx,xX->cyX", t, Ps[0])
                t = jnp.einsum("cyX,yY->cYX", t, Ps[1])
            t = jnp.moveaxis(t, 0, -1)
            return t.reshape(-1, m)

        def prolong(x, Ps, n_unk):
            shp_c = tuple(P.shape[1] for P in reversed(Ps))
            m = x.shape[1]
            if lat:
                t = x.reshape((n_unk,) + shp_c + (m,))
                if len(Ps) == 3:
                    t = jnp.einsum("cZYXm,zZ->czYXm", t, Ps[2])
                    t = jnp.einsum("czYXm,yY->czyXm", t, Ps[1])
                    t = jnp.einsum("czyXm,xX->czyxm", t, Ps[0])
                else:
                    t = jnp.einsum("cYXm,yY->cyXm", t, Ps[1])
                    t = jnp.einsum("cyXm,xX->cyxm", t, Ps[0])
                return t.reshape(-1, m)
            t = x.reshape(shp_c + (n_unk * m,))
            t = jnp.moveaxis(t, -1, 0)
            if len(Ps) == 3:
                t = jnp.einsum("cZYX,zZ->czYX", t, Ps[2])
                t = jnp.einsum("czYX,yY->czyX", t, Ps[1])
                t = jnp.einsum("czyX,xX->czyx", t, Ps[0])
            else:
                t = jnp.einsum("cYX,yY->cyX", t, Ps[1])
                t = jnp.einsum("cyX,xX->cyx", t, Ps[0])
            t = jnp.moveaxis(t, 0, -1)
            return t.reshape(-1, m)

        def apply(r, *cs):
            if n_levels == 0:  # degenerate: exact dense low-order inverse
                return cs[coarse_pos] @ r

            def vcycle(r_l, li):
                lv = levels[li]
                ocs = cs[lv["off"] : lv["off"] + lv["n_oc"]]
                dinv = cs[lv["dinv_pos"]]
                free_l = cs[lv["dinv_pos"] + 1]
                Ps = cs[lv["P_pos"] : lv["P_pos"] + dim]
                if pre_degree > 0:
                    z = cheb(
                        lv["fn"], r_l, jnp.zeros_like(r_l), dinv, lv["lam_max"],
                        ocs, pre_degree, z0_zero=True,
                    )
                    rc = r_l - lv["fn"](z, *ocs)
                else:
                    z = jnp.zeros_like(r_l)
                    rc = r_l
                rc = restrict(rc * free_l[:, None], Ps, n_unk)
                if li + 1 < n_levels:
                    nxt = levels[li + 1]
                    rc = rc * cs[nxt["dinv_pos"] + 1][:, None]
                    zc = vcycle(rc, li + 1)
                else:
                    Binv_c = cs[coarse_pos]
                    zc = Binv_c @ rc
                z = z + prolong(zc, Ps, n_unk) * free_l[:, None]
                z = cheb(lv["fn"], r_l, z, dinv, lv["lam_max"], ocs, smooth_degree)
                return z

            z = vcycle(r, 0)
            for _ in range(cycles - 1):
                lv0 = levels[0]
                z = z + vcycle(r - lv0["fn"](z, *cs[lv0["off"] : lv0["off"] + lv0["n_oc"]]), 0)
            return z

        return apply, tuple(consts)

    def _setup_parts_box(self, box):
        """V-cycle on a window-decomposed :class:`~l3ster_tpu.parallel.box.BoxSystem`.

        TPU-native decomposed multigrid: level-0 smoothing runs the box
        operator itself (the fused lattice fast path per shard with ppermute
        plane halos — ``fine_level0`` semantics are forced, which is the auto
        default for the matrix-free systems BoxSystem wraps), the restriction
        contracts each shard's node window with window-sliced per-axis
        interpolation bands and ALL-REDUCES the partial coarse vectors, and
        every level below the first coarsening runs REPLICATED on all shards
        (coarse-grid agglomeration: at flagship scale the coarse work is <5%
        of the cycle and replication avoids latency-bound tiny-shard applies).
        Ghost/padding rows are zeroed inside the band slices, so restriction
        is exact on the owned-unique stacked representation and prolongation
        never deposits into ghost planes.

        Reference analog: Ifpack2/MueLu-style preconditioning of the
        MPI-distributed operator (``solve/Ifpack2Preconditioners.hpp:85-192``)
        — which the reference cannot offer matrix-free; this is the
        decomposed counterpart of the single-chip LowOrderMG.
        """
        inner = box.inner
        axes = _axis_coords(inner.mesh)
        if axes is None:
            raise ValueError(
                "LowOrderMG requires a structured lattice mesh with lex node numbering"
            )
        if inner.mesh.dim != 3:
            raise ValueError("box LowOrderMG is 3D-only (box decomposition is)")
        dtype = box.dtype
        n_unk = inner.n_dofs // inner.mesh.n_nodes

        # lattice hierarchy (same construction rules as the single-chip path)
        level_axes = [axes]
        while len(level_axes) < self.n_levels:
            cand = [_coarsen(a) for a in level_axes[-1]]
            nd = int(np.prod([len(a) for a in cand])) * n_unk
            level_axes.append(cand)
            if nd <= self.coarse_max_dofs:
                break
        while int(np.prod([len(a) for a in level_axes[-1]])) * n_unk > self.coarse_max_dofs:
            if all(len(a) <= 2 for a in level_axes[-1]):
                break
            level_axes.append([_coarsen(a) for a in level_axes[-1]])
        if len(level_axes) < 2:
            raise ValueError("box LowOrderMG needs at least one coarsening level")
        c_ax = level_axes[1]

        fn_box, oc = box.operator_parts()
        d = box.diagonal()  # unit entries on ghost/padding planes
        dinv = jnp.where(jnp.abs(d) > 1e-14, 1.0 / d, 1.0)
        free_st = box._free_st
        own_st = box._own_st

        # lambda_max of D^-1 A by power iteration on the stacked layout
        v = jax.random.normal(jax.random.PRNGKey(0), free_st.shape + (1,), dtype=dtype)
        v = v * own_st[..., None]

        @jax.jit
        def power(v, dinv, *ocs):
            def step(_, v):
                w = dinv[..., None] * fn_box(v, *ocs)
                return w / jnp.linalg.norm(w)

            v = jax.lax.fori_loop(0, 15, step, v)
            w = dinv[..., None] * fn_box(v, *ocs)
            return jnp.vdot(v, w) / jnp.vdot(v, v)

        lam0 = float(power(v, dinv, *oc)) * 1.05

        # window-sliced per-axis interpolation bands (ghost + padding rows
        # zeroed: every global fine row is live in exactly one shard's slice)
        P = box.n_shards
        Pz_g, Py_g = box.grid
        nz_loc, ny_loc, nx = box._n1_loc[2], box._n1_loc[1], box._n1_loc[0]
        ordr = box._order
        Pxb = _interp_1d(axes[0], c_ax[0])
        Pyb = _interp_1d(axes[1], c_ax[1])
        Pzb = _interp_1d(axes[2], c_ax[2])
        nX, nY, nZ = Pxb.shape[1], Pyb.shape[1], Pzb.shape[1]
        Pz_sl = np.zeros((P, nz_loc, nZ))
        Py_sl = np.zeros((P, ny_loc, nY))
        for pz in range(Pz_g):
            for py in range(Py_g):
                p = pz * Py_g + py
                nzr = box._nez_real[pz] * ordr + 1 if box._nez_real[pz] else 0
                nyr = box._ney_real[py] * ordr + 1 if box._ney_real[py] else 0
                if nzr:
                    Pz_sl[p, :nzr] = Pzb[box._z0[pz] : box._z0[pz] + nzr]
                if nyr:
                    Py_sl[p, :nyr] = Pyb[box._y0[py] : box._y0[py] + nyr]
                if pz > 0:
                    Pz_sl[p, 0] = 0.0  # ghost plane: owned by the z-predecessor
                if py > 0:
                    Py_sl[p, 0] = 0.0  # ghost row: owned by the y-predecessor
        Pz_sl = jnp.asarray(Pz_sl, dtype)
        Py_sl = jnp.asarray(Py_sl, dtype)
        Pxb_j = jnp.asarray(Pxb, dtype)

        # levels below the first coarsening: replicated single-chip machinery
        coarse_dense = int(np.prod([len(a) for a in c_ax])) * n_unk <= self.coarse_max_dofs
        if coarse_dense:
            Binv = jnp.asarray(_assembled_dense_inv(inner, c_ax, dtype), dtype)
            coarse_consts: tuple = (Binv,)
            c_app = None
        else:
            s1 = _build_p1_system(inner, c_ax, dtype)
            sub = LowOrderMG(
                n_levels=max(1, self.n_levels - 1),
                smooth_degree=self.smooth_degree,
                pre_degree=self.pre_degree,
                cycles=1,
                fine_level0=True,  # level 0 of the sub-cycle IS s1's operator
                coarse_max_dofs=self.coarse_max_dofs,
                eig_ratio=self.eig_ratio,
            )
            c_app, sub_consts = sub.setup_parts(s1)
            coarse_consts = (jnp.asarray(s1.free_mask, dtype),) + tuple(sub_consts)

        n_oc = len(oc)
        pre_degree = self.pre_degree if self.pre_degree is not None else self.smooth_degree
        smooth_degree = self.smooth_degree
        cycles = self.cycles
        eig_ratio = self.eig_ratio
        consts = tuple(oc) + (dinv, free_st, Pz_sl, Py_sl, Pxb_j) + coarse_consts

        def apply(r, *cs):
            ocs = cs[:n_oc]
            dinv_, free_, Pz_s, Py_s, Px_ = cs[n_oc : n_oc + 5]
            ccs = cs[n_oc + 5 :]
            m = r.shape[-1]

            def vcycle0(r0):
                if pre_degree > 0:
                    z = _cheb(
                        fn_box, r0, jnp.zeros_like(r0), dinv_, lam0, ocs,
                        pre_degree, eig_ratio, z0_zero=True,
                    )
                    rcf = r0 - fn_box(z, *ocs)
                else:
                    z = jnp.zeros_like(r0)
                    rcf = r0
                rcf = rcf * free_[..., None]
                # restriction: shard-local window band contraction, then the
                # sum over the shard axis lowers to an all-reduce
                t = rcf.reshape(P, nz_loc, ny_loc, nx, n_unk, m)
                t = jnp.einsum("pzyxcm,pzZ->pZyxcm", t, Pz_s)
                t = jnp.einsum("pZyxcm,pyY->pZYxcm", t, Py_s)
                t = jnp.einsum("pZYxcm,xX->pZYXcm", t, Px_)
                rc = jnp.sum(t, axis=0).reshape(-1, m)
                if coarse_dense:
                    zc = ccs[0] @ rc
                else:
                    zc = c_app(rc * ccs[0][:, None], *ccs[1:])
                # prolongation: replicated coarse -> each shard's fine window
                # (ghost/padding band rows are zero, so ghosts stay zero)
                tz = zc.reshape(nZ, nY, nX, n_unk, m)
                tz = jnp.einsum("ZYXcm,pzZ->pzYXcm", tz, Pz_s)
                tz = jnp.einsum("pzYXcm,pyY->pzyXcm", tz, Py_s)
                tz = jnp.einsum("pzyXcm,xX->pzyxcm", tz, Px_)
                z = z + tz.reshape(r0.shape) * free_[..., None]
                return _cheb(fn_box, r0, z, dinv_, lam0, ocs, smooth_degree, eig_ratio)

            z = vcycle0(r)
            for _ in range(cycles - 1):
                z = z + vcycle0(r - fn_box(z, *ocs))
            return z

        return apply, consts
