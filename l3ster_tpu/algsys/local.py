"""Element-local least-squares assembly and operator evaluation.

TPU-native core of ``algsys/AssembleLocalSystem.hpp`` and
``algsys/EvaluateLocalOperator.hpp``.  The least-squares normal equations for
the first-order system ``A0 u + sum_d A_d du/dx_d = f`` are, per element,

    K_e = sum_q w_q |J_q|  M_q^T M_q,     F_e = sum_q w_q |J_q| M_q^T f_q,

where ``M_q[:, (n,u)] = sum_d A_d(x_q)[:, u] * B_d[q, n]`` with ``B_0`` the
basis values and ``B_d`` the physical basis derivatives.  Everything is
batched over elements (leading axis E) so the contractions become large MXU
matmuls; the reference's per-QP SIMD rank-k updates
(``AssembleLocalSystem.hpp:144-208``) are replaced by one
(E, Q*n_eq, n_loc)^T x (E, Q*n_eq, n_loc) batched product.

Local DOF ordering is node-major: local dof = node * n_unknowns + unknown.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..basis.tables import BasisType, basis_at_quadrature, basis_at_side_quadrature
from ..common.kernel import BoundaryInput, DomainInput, SpaceTimePoint
from ..mapping.geometry import (
    boundary_normals_and_measure,
    geometry_tables,
    jacobians,
    physical_basis_derivatives,
)
from ..mesh.traits import ElementType, native_dim

__all__ = [
    "DomainTables",
    "domain_tables",
    "side_tables",
    "node_tables",
    "ElementGeometry",
    "element_geometry",
    "eval_fields",
    "eval_equation_kernel",
    "eval_residual_kernel",
    "local_system",
    "local_apply_direct",
    "local_diagonal",
]


@dataclass(frozen=True)
class DomainTables:
    """Static basis/quadrature/geometry tables for one (type, order, side?)."""

    element_type: ElementType
    order: int
    values: np.ndarray  # (Q, n_nodes)
    ref_ders: np.ndarray  # (Q, dim, n_nodes)
    weights: np.ndarray  # (Q,)
    points: np.ndarray  # (Q, dim) reference coordinates
    geom_values: np.ndarray  # (Q, n_verts)
    geom_ders: np.ndarray  # (Q, dim, n_verts)
    side: int | None = None  # set for boundary tables

    @property
    def n_qp(self) -> int:
        return len(self.weights)

    @property
    def dim(self) -> int:
        return native_dim(self.element_type)


@lru_cache(maxsize=None)
def domain_tables(
    et: ElementType, order: int, q_order: int, basis_type: BasisType = BasisType.LAGRANGE
) -> DomainTables:
    b = basis_at_quadrature(et, order, q_order, basis_type)
    gv, gd = geometry_tables(et, b.points)
    return DomainTables(et, order, b.values, b.derivatives, b.weights, b.points, gv, gd)


@lru_cache(maxsize=None)
def side_tables(
    et: ElementType, order: int, side: int, q_order: int, basis_type: BasisType = BasisType.LAGRANGE
) -> DomainTables:
    b = basis_at_side_quadrature(et, order, side, q_order, basis_type)
    gv, gd = geometry_tables(et, b.points)
    return DomainTables(et, order, b.values, b.derivatives, b.weights, b.points, gv, gd, side=side)


@lru_cache(maxsize=None)
def node_tables(et: ElementType, order: int, basis_type: BasisType = BasisType.LAGRANGE) -> DomainTables:
    """Tables at the element's own nodes (for values-at-nodes evaluation)."""
    from ..basis.tables import basis_at_nodes

    b = basis_at_nodes(et, order, basis_type)
    gv, gd = geometry_tables(et, b.points)
    w = np.ones(b.values.shape[0])
    return DomainTables(et, order, b.values, b.derivatives, w, b.points, gv, gd)


@dataclass
class ElementGeometry:
    """Per-(element, qp) geometric quantities; all leading axes (E, Q)."""

    xyz: jnp.ndarray  # (E, Q, 3) physical space-time point coordinates
    phys_ders: jnp.ndarray  # (E, Q, dim, n_nodes)
    weights: jnp.ndarray  # (E, Q) quadrature weight * measure
    normals: jnp.ndarray | None = None  # (E, Q, dim) for boundary tables
    jac_inv: jnp.ndarray | None = None  # (E, Q, dim, dim) inverse Jacobian


def element_geometry(
    tables: DomainTables, verts: jnp.ndarray, dtype=None, with_phys_ders: bool = True
) -> ElementGeometry:
    """Batched geometry for a block: verts (E, n_verts, 3).

    ``with_phys_ders=False`` skips materializing the (E, Q, dim, n_nodes)
    physical-derivative tables (the sum-factorized path transforms reference
    derivatives per QP with ``jac_inv`` instead).
    """
    from ..mapping.geometry import small_det, small_inv

    dtype = dtype or verts.dtype
    dim = tables.dim
    verts = jnp.asarray(verts, dtype)
    gd = jnp.asarray(tables.geom_ders, dtype)
    gv = jnp.asarray(tables.geom_values, dtype)
    J = jax.vmap(lambda v: jacobians(gd, v[:, :dim]))(verts)  # (E, Q, dim, dim)
    Jinv = small_inv(J)
    physD = None
    hp = jax.lax.Precision.HIGHEST  # setup-time: never bf16 (cancellation)
    if with_phys_ders:
        # physD[i, n] = sum_j Jinv[j, i] refD[j, n]  (= J^-T refD)
        physD = jnp.einsum(
            "eqji,qjn->eqin", Jinv, jnp.asarray(tables.ref_ders, dtype), precision=hp
        )
    xyz = jnp.einsum("qv,evi->eqi", gv, verts, precision=hp)  # physical point
    w = jnp.asarray(tables.weights, dtype)
    if tables.side is None:
        detJ = jnp.abs(small_det(J))
        weights = w[None, :] * detJ
        normals = None
    else:
        normals, dA = jax.vmap(
            lambda Je: boundary_normals_and_measure(Je, tables.element_type, tables.side)
        )(J)
        weights = w[None, :] * dA
    return ElementGeometry(
        xyz=xyz, phys_ders=physD, weights=weights, normals=normals, jac_inv=Jinv
    )


def eval_fields(
    tables: DomainTables, geom: ElementGeometry, field_nodal: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Field values/gradients at QPs from nodal values (E, n_nodes, n_fields)."""
    N = jnp.asarray(tables.values, field_nodal.dtype)
    hp = jax.lax.Precision.HIGHEST
    vals = jnp.einsum("qn,enf->eqf", N, field_nodal, precision=hp)
    ders = jnp.einsum("eqdn,enf->eqdf", geom.phys_ders, field_nodal, precision=hp)
    return vals, ders


def _make_inputs(kernel, geom: ElementGeometry, field_vals, field_ders, time, n_fields, dim, dtype):
    E, Q = geom.weights.shape
    if field_vals is None:
        field_vals = jnp.zeros((E, Q, n_fields), dtype)
        field_ders = jnp.zeros((E, Q, dim, n_fields), dtype)
    t = jnp.asarray(time, dtype)
    if kernel.is_boundary:
        if geom.normals is None:
            raise ValueError("boundary kernel requires boundary tables (with normals)")
        return (field_vals, field_ders, geom.xyz, geom.normals), t, True
    return (field_vals, field_ders, geom.xyz), t, False


def eval_equation_kernel(
    kernel, geom: ElementGeometry, field_vals=None, field_ders=None, time=0.0, dtype=jnp.float64
):
    """Evaluate a wrapped equation kernel at all (element, qp).

    Returns A (E, Q, dim+1, n_eq, n_unk) and f (E, Q, n_eq, n_rhs).
    """
    p = kernel.params
    args, t, is_boundary = _make_inputs(
        kernel, geom, field_vals, field_ders, time, p.n_fields, p.dimension, dtype
    )

    if is_boundary:

        def one(v, d, x, nrm):
            return kernel.evaluate(BoundaryInput(v, d, SpaceTimePoint(x, t), nrm), dtype)

    else:

        def one(v, d, x):
            return kernel.evaluate(DomainInput(v, d, SpaceTimePoint(x, t)), dtype)

    return jax.vmap(jax.vmap(one))(*args)


def eval_residual_kernel(
    kernel, geom: ElementGeometry, field_vals=None, field_ders=None, time=0.0, dtype=jnp.float64
):
    """Evaluate a wrapped residual kernel at all (element, qp) -> (E, Q, n_eq, n_rhs)."""
    p = kernel.params
    args, t, is_boundary = _make_inputs(
        kernel, geom, field_vals, field_ders, time, p.n_fields, p.dimension, dtype
    )

    if is_boundary:

        def one(v, d, x, nrm):
            return kernel.evaluate(BoundaryInput(v, d, SpaceTimePoint(x, t), nrm), dtype)

    else:

        def one(v, d, x):
            return kernel.evaluate(DomainInput(v, d, SpaceTimePoint(x, t)), dtype)

    return jax.vmap(jax.vmap(one))(*args)


def _basis_stack(tables: DomainTables, geom: ElementGeometry, dtype) -> jnp.ndarray:
    """B (E, Q, dim+1, n_nodes): values then physical derivatives."""
    E = geom.weights.shape[0]
    N = jnp.broadcast_to(
        jnp.asarray(tables.values, dtype)[None, :, None, :],
        (E, tables.n_qp, 1, tables.values.shape[1]),
    )
    return jnp.concatenate([N, geom.phys_ders.astype(dtype)], axis=2)


def local_system(
    kernel,
    tables: DomainTables,
    geom: ElementGeometry,
    field_vals=None,
    field_ders=None,
    time=0.0,
    dtype=jnp.float64,
    qp_chunk: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Local LSFEM matrices K (E, n_loc, n_loc) and rhs F (E, n_loc, n_rhs).

    ``qp_chunk`` bounds the materialized M tensor: QPs are processed in
    chunks of that size with a scan accumulating K and F (the analog of the
    reference's cache-blocked batching, ``EvaluateLocalOperator.hpp:37-52``).
    """
    p = kernel.params
    A, f = eval_equation_kernel(kernel, geom, field_vals, field_ders, time, dtype)
    B = _basis_stack(tables, geom, dtype)
    E, Q = geom.weights.shape
    n_nodes = tables.values.shape[1]
    n_loc = n_nodes * p.n_unknowns

    def accumulate(A_c, f_c, B_c, w_c):
        # A_c (E,q,d,e,u), B_c (E,q,d,n), w_c (E,q)
        #
        # sqrt-weight folding: K = (sqrt(w) M)^T (sqrt(w) M) materializes ONE
        # M-sized operand instead of three (M, w-repeated, w*M) — the M tensor
        # (E, Q, n_eq, n_loc) is the dominant HBM traffic of local assembly
        # (2.9 GB at the p=4 batch-64 bench; measured 17 -> ~7 ms/batch).
        # Gauss weights and valid-element Jacobians are strictly positive, so
        # sqrt(w) is exact; a negative w means an inverted element.
        M = jnp.einsum("eqdiu,eqdn->eqinu", A_c, B_c)  # (E,q,n_eq,n_nodes,n_unk)
        q = w_c.shape[1]
        sw = jnp.sqrt(jnp.maximum(w_c, 0.0))  # (E, q)
        Ms = (
            M.reshape(E, q, p.n_equations, n_loc) * sw[:, :, None, None]
        ).reshape(E, q * p.n_equations, n_loc)
        K = jnp.einsum("eqi,eqj->eij", Ms, Ms)
        fs = (f_c * sw[:, :, None, None]).reshape(E, q * p.n_equations, p.n_rhs)
        F = jnp.einsum("eqi,eqr->eir", Ms, fs)
        return K, F

    if qp_chunk is None or qp_chunk >= Q:
        return accumulate(A, f, B, geom.weights)

    n_chunks = -(-Q // qp_chunk)
    pad = n_chunks * qp_chunk - Q

    def pad_q(x):
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, widths)

    A_p, f_p, B_p, w_p = pad_q(A), pad_q(f), pad_q(B), pad_q(geom.weights)

    def split_q(x):
        return jnp.moveaxis(
            x.reshape((E, n_chunks, qp_chunk) + x.shape[2:]), 1, 0
        )  # (n_chunks, E, qp_chunk, ...)

    def body(carry, chunk):
        K, F = carry
        A_c, f_c, B_c, w_c = chunk
        dK, dF = accumulate(A_c, f_c, B_c, w_c)
        return (K + dK, F + dF), None

    K0 = jnp.zeros((E, n_loc, n_loc), dtype)
    F0 = jnp.zeros((E, n_loc, p.n_rhs), dtype)
    (K, F), _ = jax.lax.scan(body, (K0, F0), (split_q(A_p), split_q(f_p), split_q(B_p), split_q(w_p)))
    return K, F


def local_apply_direct(
    A: jnp.ndarray, B: jnp.ndarray, weights: jnp.ndarray, x_loc: jnp.ndarray
) -> jnp.ndarray:
    """Matrix-free local operator apply: y_e = sum_q w_q M_q^T (M_q x_e).

    A (E,Q,dim+1,n_eq,n_unk), B (E,Q,dim+1,n_nodes), weights (E,Q),
    x_loc (E, n_nodes, n_unk) -> y (E, n_nodes, n_unk).
    Never materializes M (``algsys/EvaluateLocalOperator.hpp`` analog).
    """
    g = jnp.einsum("eqdn,enu->eqdu", B, x_loc)
    r = jnp.einsum("eqdiu,eqdu->eqi", A, g)
    rw = r * weights[:, :, None]
    t = jnp.einsum("eqdiu,eqi->eqdu", A, rw)
    return jnp.einsum("eqdn,eqdu->enu", B, t)


def local_rhs(A: jnp.ndarray, B: jnp.ndarray, weights: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """F_e = sum_q w_q M_q^T f_q without materializing M; (E, n_nodes, n_unk, n_rhs)."""
    fw = f * weights[:, :, None, None]
    t = jnp.einsum("eqdiu,eqir->eqdur", A, fw)
    return jnp.einsum("eqdn,eqdur->enur", B, t)


def local_diagonal(A: jnp.ndarray, B: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """diag(K_e) (E, n_nodes, n_unk): sum_q w_q sum_i M[q,i,(n,u)]^2."""
    M = jnp.einsum("eqdiu,eqdn->eqinu", A, B)
    return jnp.einsum("eq,eqinu,eqinu->enu", weights, M, M)


def local_rhs_sumfact(
    A: jnp.ndarray,
    geom: ElementGeometry,
    order: int,
    q_order: int,
    dim: int,
    f: jnp.ndarray,
) -> jnp.ndarray:
    """F_e = sum_q w_q M_q^T f_q via the transpose sweep; (E, n_nodes, n_unk, n_rhs).

    Never materializes basis tables over elements (unlike :func:`local_rhs`).
    """
    from ..ops.sumfact import sumfact_tables_1d, sumfact_transpose

    N1, D1, _ = sumfact_tables_1d(order, q_order)  # numpy; sweeps prep device tables
    Jinv = geom.jac_inv
    fw = f * geom.weights[:, :, None, None]  # (E,Q,n_eq,n_rhs)
    outs = []
    for r in range(f.shape[-1]):
        t = jnp.einsum("eqdiu,eqi->eqdu", A, fw[..., r])  # (E,Q,dim+1,u)
        t0 = t[:, :, 0, :]
        t_ref = jnp.einsum("eqji,eqiu->ejqu", Jinv, t[:, :, 1:, :])
        outs.append(sumfact_transpose(t0, t_ref, N1, D1, dim))
    return jnp.stack(outs, axis=-1)


def local_diagonal_sumfact(
    A: jnp.ndarray,
    geom: ElementGeometry,
    order: int,
    q_order: int,
    dim: int,
) -> jnp.ndarray:
    """diag(K_e) (E, n_nodes, n_unk) without materializing M or basis stacks.

    Uses the reference-space expansion diag = sum_{j,k} G_jk (x) (Bhat_j o
    Bhat_k), where G_jk[q, u] = sum_i Ahat_j[q, i, u] Ahat_k[q, i, u] with
    Ahat_0 = A_0, Ahat_j = sum_d A_d Jinv[j, d], and the elementwise basis
    products Bhat_j o Bhat_k factorize into per-axis N1/D1 products.
    """
    from ..ops.sumfact import sumfact_tables_1d, sumfact_transpose_general

    N1np, D1np, _ = sumfact_tables_1d(order, q_order)
    dt = A.dtype
    N1, D1 = jnp.asarray(N1np, dt), jnp.asarray(D1np, dt)
    Jinv = geom.jac_inv  # (E,Q,dim,dim)
    # Ahat (E,Q,dim+1,n_eq,n_unk) in reference space
    Ahat0 = A[:, :, :1]
    Ahatd = jnp.einsum("eqjd,eqdiu->eqjiu", Jinv, A[:, :, 1:])
    Ahat = jnp.concatenate([Ahat0, Ahatd], axis=2)
    G = jnp.einsum("eqjiu,eqkiu->eqjku", Ahat, Ahat)  # (E,Q,d1,d1,u)
    Gw = G * geom.weights[:, :, None, None, None]
    NN = N1 * N1
    ND = N1 * D1
    DD = D1 * D1
    out = 0.0
    for j in range(dim + 1):
        for k in range(j, dim + 1):
            tabs = []
            for a in range(dim):
                both = (j == a + 1) + (k == a + 1)
                tabs.append(DD if both == 2 else (ND if both == 1 else NN))
            s = Gw[:, :, j, k, :] * (1.0 if j == k else 2.0)
            out = out + sumfact_transpose_general(s, tabs, dim)
    return out


def pack_sumfact_operator(A: jnp.ndarray, geom: ElementGeometry, dim: int):
    """Pre-transpose the x-independent operator tensors to the lane-major
    layout used by :func:`local_apply_sumfact_packed`.

    Returns (A_t (d, n_eq, n_unk, EQ), Ji_t (dim, dim, EQ), w_t (EQ,)).
    """
    E, Q = geom.weights.shape
    EQ = E * Q
    c = A.shape[-1]
    A_t = jnp.moveaxis(A.reshape(EQ, dim + 1, -1, c), 0, -1)
    Ji_t = jnp.moveaxis(geom.jac_inv.reshape(EQ, dim, dim), 0, -1)
    w_t = geom.weights.reshape(EQ)
    return A_t, Ji_t, w_t


def _qp_algebra_packed(A_t, Ji_t, w_t, vals_l, rd, dim: int, c: int):
    """Per-QP least-squares algebra as unrolled FMA chains on (E*Q,) vectors.

    vals_l[u], rd[j][u] -> (EQ,) reference-space values/derivatives.
    Returns (t0 [u], tr [j][u]) reference-space transpose integrands.
    """
    d1, n_eq = A_t.shape[0], A_t.shape[1]
    pders = [
        [sum(Ji_t[j, i] * rd[j][u] for j in range(dim)) for u in range(c)]
        for i in range(dim)
    ]
    g = [vals_l] + pders  # g[d][u] -> (EQ,)
    r = [
        sum(A_t[d, i, u] * g[d][u] for d in range(d1) for u in range(c))
        for i in range(n_eq)
    ]
    rw = [ri * w_t for ri in r]
    t = [
        [sum(A_t[d, i, u] * rw[i] for i in range(n_eq)) for u in range(c)]
        for d in range(d1)
    ]
    tr = [
        [sum(Ji_t[j, i] * t[1 + i][u] for i in range(dim)) for u in range(c)]
        for j in range(dim)
    ]
    return t[0], tr


def _qp_algebra_nz(nz_idx, A_nz, n_eq: int, Ji_t, w_t, vals_l, rd, dim: int, c: int):
    """Variable-coefficient per-QP algebra over NONZERO planes only: the
    structural-zero skipping of :func:`_qp_algebra_const`, for x-independent
    but spatially-varying A.  ``nz_idx`` is the static tuple of (d, i, u)
    indices whose (EQ,) planes are stacked in ``A_nz`` (K, EQ)."""
    pders = [
        [sum(Ji_t[j, i] * rd[j][u] for j in range(dim)) for u in range(c)]
        for i in range(dim)
    ]
    g = [vals_l] + pders  # g[d][u] -> (EQ,)
    zero = w_t * 0.0
    r = [zero] * n_eq
    for k, (d, i, u) in enumerate(nz_idx):
        r[i] = r[i] + A_nz[k] * g[d][u]
    rw = [ri * w_t for ri in r]
    t = [[zero] * c for _ in range(dim + 1)]
    for k, (d, i, u) in enumerate(nz_idx):
        t[d][u] = t[d][u] + A_nz[k] * rw[i]
    tr = [
        [sum(Ji_t[j, i] * t[1 + i][u] for i in range(dim)) for u in range(c)]
        for j in range(dim)
    ]
    return t[0], tr


def _qp_algebra_const(A: np.ndarray, Ji_t, w_t, vals_l, rd, dim: int, c: int, dtype):
    """Constant-coefficient per-QP algebra: A's scalars are baked into the
    instruction stream and structural zeros are skipped entirely."""
    d1, n_eq = A.shape[0], A.shape[1]
    EQ = w_t.shape[0]
    pders = [
        [sum(Ji_t[j, i] * rd[j][u] for j in range(dim)) for u in range(c)] for i in range(dim)
    ]
    g = [vals_l] + pders

    def dotA(i):
        terms = [
            float(A[d, i, u]) * g[d][u]
            for d in range(d1)
            for u in range(c)
            if A[d, i, u] != 0.0
        ]
        return sum(terms) if terms else jnp.zeros((EQ,), dtype)

    r = [dotA(i) for i in range(n_eq)]
    rw = [ri * w_t for ri in r]

    def dotAT(d, u):
        terms = [float(A[d, i, u]) * rw[i] for i in range(n_eq) if A[d, i, u] != 0.0]
        return sum(terms) if terms else jnp.zeros((EQ,), dtype)

    t = [[dotAT(d, u) for u in range(c)] for d in range(d1)]
    tr = [
        [sum(Ji_t[j, i] * t[1 + i][u] for i in range(dim)) for u in range(c)]
        for j in range(dim)
    ]
    return t[0], tr


def local_apply_dense_packed(
    A_t: jnp.ndarray,
    Ji_t: jnp.ndarray,
    w_t: jnp.ndarray,
    Ball: jnp.ndarray,
    E: int,
    dim: int,
    x_loc: jnp.ndarray,
) -> jnp.ndarray:
    """Dense-basis (MXU) local apply: one matmul per direction, any element.

    Same math as :func:`local_apply_sumfact_packed` but the nodes<->QPs maps
    run as single large (E*c, n) x (n, (dim+1)Q) matmuls (see
    ``ops/dense_eval.py`` for the rationale).
    """
    from ..ops.dense_eval import dense_interpolate_channels, dense_transpose_channels

    c = x_loc.shape[-1]
    vals_l, rd = dense_interpolate_channels(x_loc, Ball, dim)
    t0, tr = _qp_algebra_packed(A_t, Ji_t, w_t, vals_l, rd, dim, c)
    return dense_transpose_channels(t0, tr, Ball, E)


def local_apply_dense_const(
    A_const: np.ndarray,
    Ji_t: jnp.ndarray,
    w_t: jnp.ndarray,
    Ball: jnp.ndarray,
    E: int,
    dim: int,
    x_loc: jnp.ndarray,
    qp_pallas: bool | None = None,
) -> jnp.ndarray:
    """Dense-basis (MXU) local apply for constant-coefficient kernels.

    On TPU the per-QP chain between the two matmuls runs as a fused Pallas
    kernel (``ops/pallas_qp.py``) so its intermediates never touch HBM;
    elsewhere (or with ``L3STER_TPU_PALLAS_QP=0``) it runs as XLA FMA chains.
    """
    import os

    from ..ops.dense_eval import dense_interpolate_channels, dense_transpose_channels

    c = x_loc.shape[-1]
    A = np.asarray(A_const, dtype=np.float64)
    if qp_pallas is None:
        qp_pallas = jax.default_backend() == "tpu" and os.environ.get(
            "L3STER_TPU_PALLAS_QP", "1"
        ) not in ("0", "false")
    if qp_pallas:
        from ..ops.dense_eval import _PREC
        from ..ops.pallas_qp import qp_algebra_const_pallas

        n = x_loc.shape[1]
        d1 = dim + 1
        Q = Ball.shape[0] // d1
        x2 = jnp.swapaxes(x_loc, 1, 2).reshape(E * c, n)
        G = jnp.matmul(x2, Ball.T, precision=_PREC)  # (E*c, d1*Q)
        g = jnp.transpose(G.reshape(E, c, d1, Q), (2, 1, 0, 3)).reshape(d1 * c, E * Q)
        ji2 = Ji_t.reshape(dim * dim, E * Q)
        t = qp_algebra_const_pallas(
            A, g, ji2, w_t, dim, c, interpret=jax.default_backend() == "cpu"
        )
        T = jnp.transpose(t.reshape(d1, c, E, Q), (2, 1, 0, 3)).reshape(E * c, d1 * Q)
        y2 = jnp.matmul(T, Ball, precision=_PREC)
        return jnp.swapaxes(y2.reshape(E, c, n), 1, 2)
    vals_l, rd = dense_interpolate_channels(x_loc, Ball, dim)
    t0, tr = _qp_algebra_const(A, Ji_t, w_t, vals_l, rd, dim, c, x_loc.dtype)
    return dense_transpose_channels(t0, tr, Ball, E)


def local_apply_sumfact_packed(
    A_t: jnp.ndarray,
    Ji_t: jnp.ndarray,
    w_t: jnp.ndarray,
    E: int,
    order: int,
    q_order: int,
    dim: int,
    x_loc: jnp.ndarray,
) -> jnp.ndarray:
    """Sum-factorized local apply with pre-packed operator tensors.

    The per-QP algebra is UNROLLED over the small (dim+1, n_eq, n_unk) index
    space into explicit FMA chains on (E*Q,)-long vectors: on TPU every
    operand is then a perfectly lane-packed VPU stream, which measured ~2.4x
    faster than the equivalent einsum formulation (XLA materializes padded
    broadcast intermediates for the small-dim contractions).
    """
    from ..ops.sumfact import sumfact_interpolate, sumfact_tables_1d, sumfact_transpose

    N1, D1, _ = sumfact_tables_1d(order, q_order)  # numpy; sweeps prep device tables
    EQ = w_t.shape[0]
    Q = EQ // E
    c = x_loc.shape[-1]
    d1, n_eq = A_t.shape[0], A_t.shape[1]

    vals, rders = sumfact_interpolate(x_loc, N1, D1, dim)

    if n_eq * c * d1 <= 512:  # unrolled FMA chains (trace size bounded)
        vals_l = [vals.reshape(EQ, c)[:, u] for u in range(c)]
        rd = [[rders[:, j].reshape(EQ, c)[:, u] for u in range(c)] for j in range(dim)]
        t0, tr = _qp_algebra_packed(A_t, Ji_t, w_t, vals_l, rd, dim, c)
        from ..ops.sumfact import sumfact_transpose_channels

        return sumfact_transpose_channels(t0, tr, N1, D1, dim, E)
    else:  # einsum fallback for very wide systems
        vals_t = jnp.moveaxis(vals.reshape(EQ, c), 0, -1)
        rders_t = jnp.moveaxis(jnp.swapaxes(rders, 1, 2).reshape(EQ, dim, c), 0, -1)
        pders = jnp.einsum("jiq,jcq->icq", Ji_t, rders_t)
        g = jnp.concatenate([vals_t[None], pders], axis=0)
        r = jnp.einsum("diuq,duq->iq", A_t, g)
        rw = r * w_t[None]
        t = jnp.einsum("diuq,iq->duq", A_t, rw)
        t_ref = jnp.einsum("jiq,iuq->juq", Ji_t, t[1:])
        t0 = jnp.moveaxis(t[0], -1, 0).reshape(E, Q, c)
        td = jnp.moveaxis(t_ref, -1, 0).reshape(E, Q, dim, c).transpose(0, 2, 1, 3)
    return sumfact_transpose(t0, td, N1, D1, dim)


def local_apply_sumfact_const(
    A_const: np.ndarray,
    Ji_t: jnp.ndarray,
    w_t: jnp.ndarray,
    E: int,
    order: int,
    q_order: int,
    dim: int,
    x_loc: jnp.ndarray,
) -> jnp.ndarray:
    """Sum-factorized local apply for CONSTANT-coefficient kernels.

    When the user kernel's operators A do not depend on position or fields,
    A is a single small (dim+1, n_eq, n_unk) matrix of python scalars: the
    per-QP chains bake the coefficients into the instruction stream, skip the
    (many) structural zeros, and eliminate all A memory traffic -- the
    dominant HBM cost of the generic packed apply.
    """
    from ..ops.sumfact import sumfact_interpolate, sumfact_tables_1d, sumfact_transpose

    N1, D1, _ = sumfact_tables_1d(order, q_order)  # numpy; sweeps prep device tables
    EQ = w_t.shape[0]
    Q = EQ // E
    c = x_loc.shape[-1]
    d1, n_eq = A_const.shape[0], A_const.shape[1]
    A = np.asarray(A_const, dtype=np.float64)

    vals, rders = sumfact_interpolate(x_loc, N1, D1, dim)
    vals_l = [vals.reshape(EQ, c)[:, u] for u in range(c)]
    rd = [[rders[:, j].reshape(EQ, c)[:, u] for u in range(c)] for j in range(dim)]
    t0, tr = _qp_algebra_const(A, Ji_t, w_t, vals_l, rd, dim, c, x_loc.dtype)
    from ..ops.sumfact import sumfact_transpose_channels

    return sumfact_transpose_channels(t0, tr, N1, D1, dim, E)


def local_apply_sumfact(
    A: jnp.ndarray,
    geom: ElementGeometry,
    order: int,
    q_order: int,
    dim: int,
    x_loc: jnp.ndarray,
) -> jnp.ndarray:
    """Sum-factorized matrix-free local apply for Quad/Hex elements.

    Mathematically identical to :func:`local_apply_direct`, but the
    nodes<->QPs interpolation runs as 1D tensor contractions
    (``algsys/SumFactorization.hpp:890-917``).  Reference-space derivatives
    are mapped with ``geom.jac_inv`` per QP, so non-affine elements are exact.
    """
    # Per-QP algebra runs in (small dims leading, E*Q in lanes) layout: on TPU
    # the trailing axis maps to vector lanes, so keeping the huge fused (E, Q)
    # axis last turns these contractions into perfectly-packed VPU FMAs
    # (measured ~350x faster than the (E, Q, ...)-leading layout).
    E = geom.weights.shape[0]
    A_t, Ji_t, w_t = pack_sumfact_operator(A, geom, dim)
    return local_apply_sumfact_packed(A_t, Ji_t, w_t, E, order, q_order, dim, x_loc)
