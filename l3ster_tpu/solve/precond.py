"""Operator-based preconditioners.

Analogs of ``solve/NativePreconditioners.hpp`` (Richardson, Jacobi with
thresholded diagonal inversion) and the Ifpack2-backed Chebyshev
(``solve/Ifpack2Preconditioners.hpp:85-192``).  All are matrix-free-friendly:
they need at most the operator diagonal and operator applies, so they work
identically for the assembled and matrix-free systems.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = [
    "Identity",
    "Richardson",
    "Jacobi",
    "Chebyshev",
    "BlockJacobi",
    "SGS",
    "ILU0",
    "ILUT",
]


def _jacobi_apply(r, inv):
    return inv[..., None] * r if r.ndim == inv.ndim + 1 else inv * r


def _assembled_csr(system, who: str):
    csr = getattr(system, "eliminated_csr", None)
    if csr is None:
        raise ValueError(
            f"{who} needs the assembled CSR: use "
            "OperatorEvaluationStrategy.GLOBAL_ASSEMBLY (single device)"
        )
    return csr()


def _is_distributed(system) -> bool:
    return getattr(system, "shard_blocks", None) is not None


def _schwarz_csrs(system, who: str, overlap: int = 1):
    """Per-shard LOCAL CSRs over the common [owned | ghost | dump] slot space
    (n = n_loc1): each shard's sub-block of the gathered matrix, unit diagonal
    on unused/dump slots.

    ``overlap=1`` (default): blocks span [owned | ghost] — classical additive
    Schwarz with one layer of overlap.  The apply is import (owner -> ghost) →
    per-shard local solve → export (ghost -> owner sum) → owned mask, which is
    SYMMETRIC (sum of R_p^T A_p^{-1} R_p), so it is CG-safe.  ``overlap=0``
    drops all inter-shard coupling (block-Jacobi over shards; no comm).
    """
    try:
        blocks = system.shard_blocks(overlap=overlap)
    except RuntimeError as e:
        raise ValueError(
            f"{who} on a DistributedSystem needs "
            "OperatorEvaluationStrategy.GLOBAL_ASSEMBLY (per-shard local "
            "matrices are assembled from the gathered CSR)"
        ) from e
    n = system.n_loc1
    out = []
    for sub, n_real in blocks:
        import numpy as np

        nnz = sub.indptr[-1]
        n_pad = n - n_real
        data = np.concatenate([sub.data, np.ones(n_pad)])
        indices = np.concatenate(
            [sub.indices.astype(np.int64), np.arange(n_real, n, dtype=np.int64)]
        )
        indptr = np.concatenate(
            [sub.indptr.astype(np.int64), nnz + 1 + np.arange(n_pad, dtype=np.int64)]
        )
        out.append((data, indices, indptr))
    return out, n


def _stacked_spmv(csrs, n, dtype):
    """Per-shard local CSR matvec in the stacked (P, n, n_rhs) layout.

    Pads every shard to the max nnz; padded entries scatter zero into a dump
    row.  Used by multi-sweep distributed relaxation (the local residual
    update A_p z inside the Schwarz solve)."""
    import numpy as np

    nnz_max = max(int(pp[-1]) for _, _, pp in csrs)
    P = len(csrs)
    data = np.zeros((P, nnz_max))
    rows = np.full((P, nnz_max), n, dtype=np.int64)
    cols = np.zeros((P, nnz_max), dtype=np.int64)
    for p, (dd, ii, pp) in enumerate(csrs):
        m = int(pp[-1])
        data[p, :m] = dd[:m]
        cols[p, :m] = ii[:m]
        rows[p, :m] = np.repeat(np.arange(n), np.diff(pp))

    def spmv(x, data, rows, cols):
        def one(xp, dp, rp, cp):
            y = jnp.zeros((n + 1, xp.shape[-1]), xp.dtype)
            return y.at[rp].add(dp[:, None] * xp[cp])[:n]

        return jax.vmap(one)(x, data, rows, cols)

    return spmv, (
        jnp.asarray(data, dtype),
        jnp.asarray(rows, jnp.int32),
        jnp.asarray(cols, jnp.int32),
    )


def _schwarz_wrap(system, local_apply, consts, overlap: int):
    """Distributed preconditioner apply around a per-shard local solve.

    overlap >= 1: shard_map'ed import -> local solve -> export -> owned mask
    (one halo exchange each way per application, riding the system's existing
    ring-offset ppermute pattern).  overlap == 0: no communication -- the
    stacked local solves run as-is (sharded batch axis)."""
    if overlap == 0:
        return local_apply, consts
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    n_comm = 3 * system._n_neighbors
    comm = system._comm_arrays()

    def fn(r, owned_l, *rest):
        r, owned_l = r[0], owned_l[0]
        comm_args = [a[0] for a in rest[:n_comm]]
        cs = tuple(rest[n_comm:])  # keep the (1, ...) shard slice: the local
        # solve is the stacked (vmapped) apply run at batch size 1
        rg = system._import(r, comm_args)
        z = local_apply(rg[None], *cs)[0]
        z = system._export(z, comm_args)
        return (z * owned_l[:, None])[None]

    n_args = 2 + n_comm + len(consts)
    sharded = _jax.shard_map(
        fn,
        mesh=system.device_mesh,
        in_specs=(P("shards"),) * n_args,
        out_specs=P("shards"),
    )
    all_consts = (system._owned_mask, *comm, *consts)
    return (lambda r, *cs: sharded(r, *cs)), all_consts


def _identity_apply(r, *pc):
    return r


@dataclass(frozen=True)
class Identity:
    supports_lattice_layout = True

    def setup(self, system):
        return lambda r: r

    def setup_parts(self, system, layout="dof"):
        return _identity_apply, ()


@dataclass(frozen=True)
class Richardson:
    """M^-1 = factor * I (``NativePreconditioners.hpp`` Richardson)."""

    factor: float = 1.0
    supports_lattice_layout = True

    def setup(self, system):
        f = self.factor
        return lambda r: f * r

    def setup_parts(self, system, layout="dof"):
        f = self.factor
        return (lambda r, *pc: f * r), ()


@dataclass(frozen=True)
class Jacobi:
    """Inverted thresholded diagonal (``NativePreconditioners.hpp`` NativeJacobi).

    ``sweeps``/``damping`` mirror the Ifpack2 relaxation options
    (``Ifpack2Preconditioners.hpp:68-96``): k damped Jacobi iterations on
    M z = r (each extra sweep costs one operator apply).
    """

    threshold: float = 1e-14
    sweeps: int = 1
    lag: int = 0  # reuse setup across up to `lag` reassemblies (frozen-M)
    damping: float = 1.0
    supports_lattice_layout = True

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def setup_parts(self, system, layout="dof"):
        """(apply(r, *consts), consts): the inverted diagonal travels as a jit
        argument so solvers never inline it into the compiled program."""
        d = system.diagonal()
        inv = jnp.where(jnp.abs(d) > self.threshold, self.damping / d, self.damping)
        if layout == "lattice":
            inv = system.to_lattice_layout(inv)
        if self.sweeps <= 1:
            # module-level fn: its identity survives reassembly epochs, so
            # cached solve programs need no re-trace in transient loops
            return _jacobi_apply, (inv,)
        fn, oconsts = (
            system.operator_parts(layout=layout)
            if layout != "dof"
            else system.operator_parts()
        )
        n_sweeps = self.sweeps

        def apply(r, inv, *oc):
            iv = inv[..., None] if r.ndim == inv.ndim + 1 else inv
            z = iv * r
            for _ in range(n_sweeps - 1):
                z = z + iv * (r - fn(z, *oc))
            return z

        return apply, (inv, *oconsts)


@dataclass(frozen=True)
class Chebyshev:
    """Chebyshev polynomial preconditioner on the Jacobi-scaled operator.

    lambda_max of D^-1 A is estimated with power iteration at setup;
    lambda_min = lambda_max / eig_ratio (Ifpack2's convention).
    """

    degree: int = 4
    eig_ratio: float = 30.0
    power_iters: int = 20
    boost: float = 1.05

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def setup_parts(self, system):
        fn, oconsts = system.operator_parts()
        d = system.diagonal()
        dinv_c = jnp.where(jnp.abs(d) > 1e-14, 1.0 / d, 1.0)

        def scaled_op(x):
            return dinv_c[..., None] * fn(x, *oconsts)

        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, d.shape + (1,), dtype=d.dtype)

        def power_step(_, v):
            w = scaled_op(v)
            return w / jnp.linalg.norm(w)

        v = jax.lax.fori_loop(0, self.power_iters, power_step, v)
        lam_max = jnp.vdot(v, scaled_op(v)) / jnp.vdot(v, v) * self.boost
        lam_min = lam_max / self.eig_ratio

        theta_c = 0.5 * (lam_max + lam_min)
        delta_c = 0.5 * (lam_max - lam_min)
        degree = self.degree

        def apply(r, dinv, theta, delta, *oc):
            # Chebyshev iteration on (D^-1 A) z = D^-1 r, z0 = 0; degree is
            # small and static, so the recurrence is unrolled at trace time.
            rs = dinv[..., None] * r
            z = rs / theta
            zp = jnp.zeros_like(z)
            rho = delta / theta
            for _ in range(degree - 1):
                rho_new = 1.0 / (2.0 * theta / delta - rho)
                resid = rs - dinv[..., None] * fn(z, *oc)
                z_new = z + rho_new * ((2.0 / delta) * resid + rho * (z - zp))
                zp, z, rho = z, z_new, rho_new
            return z

        return apply, (dinv_c, theta_c, delta_c) + tuple(oconsts)


@dataclass(frozen=True)
class BlockJacobi:
    """Per-node dense block inverses (assembled path).

    The MXU-friendly strong-diagonal option: each node's coupled unknowns
    form a small dense block, inverted once at setup (batched Cholesky —
    the LSFEM normal matrix is SPD) and applied as one batched matmul.
    Blocking follows the DofMap's node grouping when the system has one,
    else consecutive ``block_size`` chunks.
    """

    block_size: int = 0  # 0 = derive from the system's DofMap

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def _blocks(self, system, n: int) -> "np.ndarray":
        import numpy as np

        dofmap = getattr(system, "dofmap", None)
        if self.block_size <= 0 and dofmap is not None:
            nd = np.asarray(dofmap.node_dof)
            K = nd.shape[1]
            blocks, seen = [], np.zeros(n, dtype=bool)
            for row in nd:
                d = row[row >= 0]
                d = d[~seen[d]]
                if not len(d):
                    continue
                seen[d] = True
                blocks.append(np.concatenate([d, np.full(K - len(d), n, dtype=np.int64)]))
            if not seen.all():  # dofs outside any node row (defensive)
                rest = np.nonzero(~seen)[0]
                for d in rest:
                    blocks.append(np.concatenate([[d], np.full(K - 1, n, dtype=np.int64)]))
            return np.asarray(blocks, dtype=np.int64)
        K = max(1, self.block_size)
        m = -(-n // K)
        b = np.full((m, K), n, dtype=np.int64)
        flat = np.arange(n, dtype=np.int64)
        b.reshape(-1)[: len(flat)] = flat
        return b

    def setup_parts(self, system):
        import numpy as np

        data, indices, indptr, n = _assembled_csr(system, "BlockJacobi")
        data = np.asarray(data, dtype=np.float64)
        indices = np.asarray(indices, dtype=np.int64)
        indptr = np.asarray(indptr, dtype=np.int64)
        blocks = self._blocks(system, n)  # (M, K) dof ids, pad = n
        M, K = blocks.shape
        # CSR keys are globally sorted (rows increasing, cols sorted per row)
        rows_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        keys = rows_all * (n + 1) + indices  # n+1 base keeps pad keys distinct
        want = blocks[:, :, None] * (n + 1) + blocks[:, None, :]
        pos = np.searchsorted(keys, want.reshape(-1))
        posc = np.minimum(pos, len(keys) - 1)
        hit = (pos < len(keys)) & (keys[posc] == want.reshape(-1))
        vals = np.where(hit, data[posc], 0.0).reshape(M, K, K)
        # identity rows/cols on padded slots keep the blocks invertible
        pad = blocks == n
        vals = np.where(pad[:, :, None] | pad[:, None, :], 0.0, vals)
        idx = np.arange(K)
        vals[:, idx, idx] = np.where(pad, 1.0, vals[:, idx, idx])
        d = system.diagonal()
        dtype = d.dtype
        import jax.scipy.linalg as jsl

        B = jnp.asarray(vals, dtype)
        L = jnp.linalg.cholesky(B)
        Binv = jsl.cho_solve((L, True), jnp.broadcast_to(jnp.eye(K, dtype=dtype), B.shape))
        blk = jnp.asarray(blocks, jnp.int32)

        def apply(r, Binv, blk):
            n_rhs = r.shape[-1]
            rp = jnp.concatenate([r, jnp.zeros((1, n_rhs), r.dtype)])
            xb = rp[blk]  # (M, K, n_rhs)
            yb = jnp.einsum("mij,mjr->mir", Binv, xb)
            y = jnp.zeros((n + 1, n_rhs), r.dtype)
            y = y.at[blk.reshape(-1)].set(yb.reshape(-1, n_rhs))
            return y[:n]

        return apply, (Binv, blk)


@dataclass(frozen=True)
class SGS:
    """Symmetric Gauss-Seidel: M = (D+L) D^-1 (D+U) on the assembled CSR
    (``solve/Ifpack2Preconditioners.hpp:97``).  Triangular solves run
    level-scheduled inside jit (see :mod:`l3ster_tpu.solve.tri`);
    ``sweeps`` adds Ifpack2-style relaxation iterations (one operator apply
    per extra sweep).  Distributed: per-shard local SGS (additive Schwarz
    with ``overlap`` ghost layers)."""

    sweeps: int = 1
    overlap: int = 1
    lag: int = 0  # reuse factors across up to `lag` reassemblies (frozen-M)

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def setup_parts(self, system):
        from .tri import build_tri_solve, build_tri_solve_stacked

        d = system.diagonal()
        dtype = d.dtype
        if _is_distributed(system):
            # per-shard local SGS (additive Schwarz; Ifpack2 relaxation on
            # each rank's local row matrix)
            import numpy as np

            csrs, n = _schwarz_csrs(system, "SGS", self.overlap)
            fwd, cf = build_tri_solve_stacked(
                csrs, n, lower=True, unit_diag=False, dtype=dtype
            )
            bwd, cb = build_tri_solve_stacked(
                csrs, n, lower=False, unit_diag=False, dtype=dtype
            )
            dstk = np.ones((len(csrs), n))
            for p, (dd, ii, pp) in enumerate(csrs):
                rows = np.repeat(np.arange(n), np.diff(pp))
                sel = rows == ii
                dstk[p, rows[sel]] = dd[sel]
            dvec_s = jnp.asarray(dstk, dtype)
            nfd = len(cf)

            n_tri = nfd + len(cb)

            def M_loc(r, cs):
                w = fwd(r, *cs[1 : 1 + nfd])
                return bwd(w * cs[0][..., None], *cs[1 + nfd : 1 + n_tri])

            if self.sweeps <= 1:

                def local(r, *cs):
                    return M_loc(r, cs)

                return _schwarz_wrap(system, local, (dvec_s, *cf, *cb), self.overlap)
            # Ifpack2 semantics: ``sweeps`` relaxes each rank's LOCAL matrix
            # (processor-block relaxation) — the extra sweeps run INSIDE the
            # Schwarz solve against the local CSR, so the composed local
            # M_p stays SPD (lambda(M_p A_p) <= 1 for SGS) and the additive
            # sum is CG-safe.  A GLOBAL composition z + M(r - A z) is NOT:
            # unweighted overlap-1 Schwarz has lambda_max(MA) >= 2 on the
            # overlap, making 2M - MAM indefinite (measured: CG stalls at
            # rel res 0.23 on the 4-shard test problem).
            spmv, scs = _stacked_spmv(csrs, n, dtype)
            n_sweeps = self.sweeps

            def local(r, *cs):
                tri_cs, sp_cs = cs[: 1 + n_tri], cs[1 + n_tri :]
                z = M_loc(r, tri_cs)
                for _ in range(n_sweeps - 1):
                    z = z + M_loc(r - spmv(z, *sp_cs), tri_cs)
                return z

            return _schwarz_wrap(
                system, local, (dvec_s, *cf, *cb, *scs), self.overlap
            )
        data, indices, indptr, n = _assembled_csr(system, "SGS")
        fwd, cf = build_tri_solve(
            data, indices, indptr, n, lower=True, unit_diag=False, dtype=dtype
        )
        bwd, cb = build_tri_solve(
            data, indices, indptr, n, lower=False, unit_diag=False, dtype=dtype
        )
        dvec = jnp.asarray(d, dtype)
        nf = len(cf)
        n_tri = nf + len(cb)

        def M(r, dvec, cs):
            w = fwd(r, *cs[:nf])
            return bwd(w * dvec[..., None], *cs[nf:n_tri])

        if self.sweeps <= 1:

            def apply(r, dvec, *cs):
                return M(r, dvec, cs)

            return apply, (dvec, *cf, *cb)
        fn, oconsts = system.operator_parts()
        n_sweeps = self.sweeps

        def apply(r, dvec, *cs):
            z = M(r, dvec, cs)
            for _ in range(n_sweeps - 1):
                z = z + M(r - fn(z, *cs[n_tri:]), dvec, cs)
            return z

        return apply, (dvec, *cf, *cb, *oconsts)


@dataclass(frozen=True)
class ILU0:
    """Zero-fill incomplete LU (``Ifpack2Preconditioners.hpp:148`` RILUK(0)).

    Host-side factorization on the eliminated CSR's own sparsity; the two
    triangular solves run level-scheduled inside jit.  On a distributed
    system this becomes additive Schwarz with per-shard ILU0 local solves
    (``overlap`` layers of ghost dofs; symmetric, CG-safe)."""

    overlap: int = 1
    lag: int = 0  # reuse factors across up to `lag` reassemblies (frozen-M)

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def setup_parts(self, system):
        from .tri import build_tri_solve, build_tri_solve_stacked, ilu0_factor

        d = system.diagonal()
        dtype = d.dtype
        import numpy as np

        if _is_distributed(system):
            # additive Schwarz with per-shard ILU0 local solves — the
            # Ifpack2-under-MPI semantics (``Ifpack2Preconditioners.hpp:148``
            # on the local row matrix of each rank)
            csrs, n = _schwarz_csrs(system, "ILU0", self.overlap)
            facs = [
                (ilu0_factor(dd, ii, pp, n), ii, pp) for dd, ii, pp in csrs
            ]
            fwd, cf = build_tri_solve_stacked(
                facs, n, lower=True, unit_diag=True, dtype=dtype
            )
            bwd, cb = build_tri_solve_stacked(
                facs, n, lower=False, unit_diag=False, dtype=dtype
            )
            nfd = len(cf)

            def local(r, *cs):
                return bwd(fwd(r, *cs[:nfd]), *cs[nfd:])

            return _schwarz_wrap(system, local, (*cf, *cb), self.overlap)
        data, indices, indptr, n = _assembled_csr(system, "ILU0")
        fac = ilu0_factor(np.asarray(data), indices, indptr, n)
        fwd, cf = build_tri_solve(
            fac, indices, indptr, n, lower=True, unit_diag=True, dtype=dtype
        )
        bwd, cb = build_tri_solve(
            fac, indices, indptr, n, lower=False, unit_diag=False, dtype=dtype
        )
        nf = len(cf)

        def apply(r, *cs):
            w = fwd(r, *cs[:nf])
            return bwd(w, *cs[nf:])

        return apply, (*cf, *cb)


@dataclass(frozen=True)
class ILUT:
    """Threshold incomplete LU (``Ifpack2Preconditioners.hpp:174``).

    Host-side SuperLU incomplete factorization (scipy ``spilu``) with drop
    tolerance and fill cap; the permuted triangular solves run level-scheduled
    inside jit like :class:`ILU0`.
    """

    drop_tol: float = 1e-4
    fill_factor: float = 10.0
    overlap: int = 1
    lag: int = 0  # reuse factors across up to `lag` reassemblies (frozen-M)

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def setup_parts(self, system):
        import numpy as np
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        from .tri import build_tri_solve, build_tri_solve_stacked

        d = system.diagonal()
        dtype = d.dtype
        if _is_distributed(system):
            # per-shard local ILUT (SuperLU spilu on each Schwarz block)
            csrs, n = _schwarz_csrs(system, "ILUT", self.overlap)
            Ls, Us, prs, pcs = [], [], [], []
            for dd, ii, pp in csrs:
                A = sp.csr_matrix((dd, ii, pp), shape=(n, n)).tocsc()
                ilu = spla.spilu(A, drop_tol=self.drop_tol, fill_factor=self.fill_factor)
                L, U = ilu.L.tocsr(), ilu.U.tocsr()
                Ls.append((L.data, L.indices, L.indptr))
                Us.append((U.data, U.indices, U.indptr))
                prs.append(np.asarray(ilu.perm_r))
                pcs.append(np.asarray(ilu.perm_c))
            fwd, cf = build_tri_solve_stacked(Ls, n, lower=True, unit_diag=True, dtype=dtype)
            bwd, cb = build_tri_solve_stacked(Us, n, lower=False, unit_diag=False, dtype=dtype)
            pr = jnp.asarray(np.stack(prs), jnp.int32)
            pc_ = jnp.asarray(np.stack(pcs), jnp.int32)
            nfd = len(cf)

            def local(r, pr, pc_, *cs):
                t = jnp.zeros_like(r)
                t = jax.vmap(lambda tp, prp, rp: tp.at[prp].set(rp))(t, pr, r)
                w = fwd(t, *cs[:nfd])
                y = bwd(w, *cs[nfd:])
                return jax.vmap(lambda yp, pcp: yp[pcp])(y, pc_)

            return _schwarz_wrap(system, local, (pr, pc_, *cf, *cb), self.overlap)
        data, indices, indptr, n = _assembled_csr(system, "ILUT")
        A = sp.csr_matrix(
            (np.asarray(data, dtype=np.float64), np.asarray(indices), np.asarray(indptr)),
            shape=(n, n),
        ).tocsc()
        ilu = spla.spilu(A, drop_tol=self.drop_tol, fill_factor=self.fill_factor)
        L = ilu.L.tocsr()
        U = ilu.U.tocsr()
        # Pr A Pc = L U  =>  M^-1 b = Pc U^-1 L^-1 Pr b
        fwd, cf = build_tri_solve(
            L.data, L.indices, L.indptr, n, lower=True, unit_diag=True, dtype=dtype
        )
        bwd, cb = build_tri_solve(
            U.data, U.indices, U.indptr, n, lower=False, unit_diag=False, dtype=dtype
        )
        pr = jnp.asarray(np.asarray(ilu.perm_r), jnp.int32)
        pc_ = jnp.asarray(np.asarray(ilu.perm_c), jnp.int32)
        nf = len(cf)

        def apply(r, pr, pc_, *cs):
            # scipy SuperLU semantics (verified vs lu.solve):
            # t[perm_r] = b;  y = U^-1 L^-1 t;  x = y[perm_c]
            t = jnp.zeros_like(r).at[pr].set(r)
            w = fwd(t, *cs[:nf])
            y = bwd(w, *cs[nf:])
            return y[pc_]

        return apply, (pr, pc_, *cf, *cb)
