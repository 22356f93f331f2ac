"""Global banded sum-factorization (ops/lattice_sumfact.py) vs oracles.

LATTICE_SF must agree with the per-element sum-factorized apply to machine
precision in f64 for constant and variable coefficients, 2D and 3D, and the
lattice gather/scatter plans must agree with plain index gathers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import l3ster_tpu as lt
from l3ster_tpu.common.enums import LocalEvalStrategy


def _diffusion_3d(inp, out):
    ops, rhs = out
    A0, Ax, Ay, Az = ops
    Ax[0, 1] = -1.0
    Ay[0, 2] = -1.0
    Az[0, 3] = -1.0
    A0[1, 1] = -1.0
    Ax[1, 0] = 1.0
    A0[2, 2] = -1.0
    Ay[2, 0] = 1.0
    A0[3, 3] = -1.0
    Az[3, 0] = 1.0
    Ay[4, 3] = 1.0
    Az[4, 2] = -1.0
    Ax[5, 3] = -1.0
    Az[5, 1] = 1.0
    Ax[6, 2] = 1.0
    Ay[6, 1] = -1.0


def _var_3d(inp, out):
    ops, rhs = out
    A0, Ax, Ay, Az = ops
    k = 1.0 + inp.point.x * inp.point.y
    Ax[0, 1] = -k
    Ay[0, 2] = -k
    Az[0, 3] = -k
    A0[1, 1] = -1.0
    Ax[1, 0] = 1.0
    A0[2, 2] = -1.0
    Ay[2, 0] = 1.0
    A0[3, 3] = -1.0
    Az[3, 0] = 1.0


def _build_3d(strategy, kernel, n_eq, order=3, n1=4):
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0, 1, n1)), order=order)
    problem = lt.ProblemDefinition(4, [0])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
    )
    system = lt.make_algebraic_system(mesh, problem, None, params)
    kd = lt.wrap_domain_equation_kernel(
        kernel, lt.KernelParams(dimension=3, n_equations=n_eq, n_unknowns=4)
    )
    system.begin_assembly()
    system.assemble_problem(kd, [0], options=lt.AssemblyOptions(eval_strategy=strategy))
    system.end_assembly()
    return system


@pytest.mark.parametrize("order", [2, 3, 5, 6, 7, 8])
def test_lattice_sf_matches_sumfact_3d(order):
    n1 = 4 if order <= 4 else 3  # bound node counts at high p
    s1 = _build_3d(LocalEvalStrategy.SUM_FACT, _diffusion_3d, 7, order, n1)
    s2 = _build_3d(LocalEvalStrategy.LATTICE_SF, _diffusion_3d, 7, order, n1)
    x = jnp.asarray(np.random.default_rng(order).normal(size=(s1.n_dofs, 1)))
    y1, y2 = s1.operator()(x), s2.operator()(x)
    assert float(jnp.abs(y1 - y2).max() / jnp.abs(y1).max()) < 1e-12


def test_lattice_sf_variable_coefficients():
    s1 = _build_3d(LocalEvalStrategy.SUM_FACT, _var_3d, 4)
    s2 = _build_3d(LocalEvalStrategy.LATTICE_SF, _var_3d, 4)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(s1.n_dofs, 1)))
    assert float(jnp.abs(s1.operator()(x) - s2.operator()(x)).max()) < 1e-10


def test_lattice_sf_2d():
    def d2(inp, out):
        ops, rhs = out
        A0, Ax, Ay = ops
        Ax[0, 1] = -1.0
        Ay[0, 2] = -1.0
        A0[1, 1] = -1.0
        Ax[1, 0] = 1.0
        A0[2, 2] = -1.0
        Ay[2, 0] = 1.0

    def build(strategy):
        mesh = lt.generate_mesh(
            lt.make_square_mesh(np.linspace(0, 1, 5), np.linspace(0, 2, 4)), order=4
        )
        problem = lt.ProblemDefinition(3, [0])
        params = lt.AlgebraicSystemParams(
            eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
        )
        system = lt.make_algebraic_system(mesh, problem, None, params)
        kd = lt.wrap_domain_equation_kernel(
            d2, lt.KernelParams(dimension=2, n_equations=3, n_unknowns=3)
        )
        system.begin_assembly()
        system.assemble_problem(
            kd, [0], options=lt.AssemblyOptions(eval_strategy=strategy)
        )
        system.end_assembly()
        return system

    s1, s2 = build(LocalEvalStrategy.SUM_FACT), build(LocalEvalStrategy.LATTICE_SF)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(s1.n_dofs, 1)))
    assert float(jnp.abs(s1.operator()(x) - s2.operator()(x)).max()) < 1e-11


def test_lattice_sf_rejects_unstructured():
    """Explicit LATTICE_SF on a non-lattice mesh must raise, not mis-compute."""
    mesh = lt.generate_mesh(
        lt.make_cylinder_in_channel_2d(n_circumf=8, n_radial=3, n_left=2,
                                       n_right=2, n_bottom=2, n_top=2),
        order=2,
    )
    problem = lt.ProblemDefinition(3, [0])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
    )
    system = lt.make_algebraic_system(mesh, problem, None, params)

    def d2(inp, out):
        ops, rhs = out
        ops[0][0, 0] = 1.0

    kd = lt.wrap_domain_equation_kernel(
        d2, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=1)
    )
    system.begin_assembly()
    with pytest.raises(ValueError):
        system.assemble_problem(
            kd, [0], dof_inds=[0],
            options=lt.AssemblyOptions(eval_strategy=LocalEvalStrategy.LATTICE_SF),
        )
        system.end_assembly()
        system.operator()(jnp.zeros((system.n_dofs, 1)))


@pytest.mark.parametrize("p,ne,qo", [(2, 3, 4), (3, 2, 8), (4, 2, 10), (6, 1, 12)])
def test_fused_z_sweep_parity(p, ne, qo):
    """The Pallas fused z-sweep (interpret mode) must reproduce the unfused
    XLA chain exactly in f64 across orders, including RQ-padding cases."""
    import jax.numpy as jnp

    from l3ster_tpu.algsys.local import _qp_algebra_const
    from l3ster_tpu.ops.lattice_sumfact import _tabs, lattice_interp, lattice_transpose
    from l3ster_tpu.ops.pallas_zsweep import fused_z_sweep

    q1 = qo // 2 + 1
    n1 = (ne * p + 1,) * 3
    nes = (ne,) * 3
    C = 4
    qsh = tuple(q1 * n for n in reversed(nes))
    S, R, Q = qsh
    EQ = S * R * Q
    rng = np.random.default_rng(p)
    dt = jnp.float64
    tabs = _tabs(p, qo, nes, dt)
    (NxT, DxT), (NyT, DyT), (NzT, DzT) = tabs
    Ji = jnp.asarray(rng.normal(size=(3, 3, EQ)) * 0.1 + np.eye(3)[:, :, None], dt)
    w = jnp.asarray(rng.uniform(0.5, 1.0, EQ), dt)
    A = rng.normal(size=(4, 7, 4)) * (rng.uniform(size=(4, 7, 4)) > 0.5)
    t = jnp.asarray(rng.normal(size=(C,) + tuple(reversed(n1))), dt)

    v, ders = lattice_interp(t, tabs)
    vals_l = [v[u].reshape(EQ) for u in range(C)]
    rd = [[dd[u].reshape(EQ) for u in range(C)] for dd in ders]
    t0, tr = _qp_algebra_const(A, Ji, w, vals_l, rd, 3, C, dt)
    t0s = jnp.stack([x_.reshape(qsh) for x_ in t0])
    tds = [jnp.stack([x_.reshape(qsh) for x_ in tr[j]]) for j in range(3)]
    y_ref = lattice_transpose(t0s, tds, tabs)

    n1z = t.shape[1]
    ax = jnp.einsum("czyx,xQ->czyQ", t, NxT)
    adx0 = jnp.einsum("czyx,xQ->czyQ", t, DxT)
    b = jnp.einsum("czyQ,yR->zcRQ", ax, NyT).reshape(n1z, C, R * Q)
    bdy = jnp.einsum("czyQ,yR->zcRQ", ax, DyT).reshape(n1z, C, R * Q)
    bdx = jnp.einsum("czyQ,yR->zcRQ", adx0, NyT).reshape(n1z, C, R * Q)
    a, ady, adx = fused_z_sweep(
        A, b, bdy, bdx, Ji.reshape(9, S, R * Q), w.reshape(S, R * Q), NzT, DzT,
        block=256, interpret=True,
    )
    a = a.reshape(n1z, C, R, Q)
    ady = ady.reshape(n1z, C, R, Q)
    adx = adx.reshape(n1z, C, R, Q)
    a2 = jnp.einsum("zcRQ,yR->czyQ", a, NyT) + jnp.einsum("zcRQ,yR->czyQ", ady, DyT)
    adx2 = jnp.einsum("zcRQ,yR->czyQ", adx, NyT)
    y_fused = jnp.einsum("czyQ,xQ->czyx", a2, NxT) + jnp.einsum(
        "czyQ,xQ->czyx", adx2, DxT
    )
    err = float(jnp.abs(y_fused - y_ref).max() / jnp.abs(y_ref).max())
    assert err < 1e-12, err


@pytest.mark.parametrize("p,ne,qo", [(2, 3, 4), (4, 2, 10), (6, 1, 12)])
def test_fused_z_sweep_v2_parity(p, ne, qo):
    """The lane-packed v2 kernel (interpret mode) must match v1 exactly in
    f64, in both full-Jacobian and factorized diagonal-geometry modes."""
    import jax.numpy as jnp

    from l3ster_tpu.ops.lattice_sumfact import _tabs
    from l3ster_tpu.ops.pallas_zsweep import fused_z_sweep
    from l3ster_tpu.ops.pallas_zsweep2 import detect_diag_geometry, fused_z_sweep_v2

    q1 = qo // 2 + 1
    nes = (ne,) * 3
    C = 4
    S = R = Q = ne * q1
    EQ = S * R * Q
    rng = np.random.default_rng(p)
    dt = jnp.float64
    tabs = _tabs(p, qo, nes, dt)
    _, _, (NzT, DzT) = tabs
    A = rng.normal(size=(4, 7, 4)) * (rng.uniform(size=(4, 7, 4)) > 0.5)
    n1z = ne * p + 1
    b = jnp.asarray(rng.normal(size=(n1z, C, R * Q)), dt)
    bdy = jnp.asarray(rng.normal(size=(n1z, C, R * Q)), dt)
    bdx = jnp.asarray(rng.normal(size=(n1z, C, R * Q)), dt)
    # full geometry
    Ji = jnp.asarray(rng.normal(size=(3, 3, EQ)) * 0.1 + np.eye(3)[:, :, None], dt)
    w = jnp.asarray(rng.uniform(0.5, 1.0, EQ), dt)
    r1 = fused_z_sweep(
        A, b, bdy, bdx, Ji.reshape(9, S, R * Q), w.reshape(S, R * Q), NzT, DzT,
        block=256, interpret=True,
    )
    r2 = fused_z_sweep_v2(
        A, b, bdy, bdx, ("full", Ji.reshape(9, S, R * Q), w.reshape(S, R * Q)),
        NzT, DzT, block=256, interpret=True,
    )
    for x1, x2 in zip(r1, r2):
        assert float(jnp.abs(x1 - x2).max()) < 1e-11
    # separable diagonal geometry (axis-aligned box meshes)
    jxv = rng.uniform(0.5, 1.5, (1, R * Q))
    jyv = rng.uniform(0.5, 1.5, (1, R * Q))
    jzv = rng.uniform(0.5, 1.5, (S, 1))
    Jd = np.zeros((3, 3, S, R * Q))
    Jd[0, 0], Jd[1, 1], Jd[2, 2] = jxv, jyv, jzv
    wd = rng.uniform(0.5, 1.0, (S, 1)) * rng.uniform(0.5, 1.0, (1, R * Q))
    g = detect_diag_geometry(Jd.reshape(3, 3, EQ), wd.reshape(EQ), S)
    assert g is not None and g[0] == "diag"
    r1 = fused_z_sweep(
        A, b, bdy, bdx, jnp.asarray(Jd.reshape(9, S, R * Q), dt), jnp.asarray(wd, dt),
        NzT, DzT, block=256, interpret=True,
    )
    r2 = fused_z_sweep_v2(A, b, bdy, bdx, g, NzT, DzT, block=256, interpret=True)
    for x1, x2 in zip(r1, r2):
        assert float(jnp.abs(x1 - x2).max()) < 1e-11
    # natural (c, n1z, RQ) layout: same answers, relayout-free blocks
    r3 = fused_z_sweep_v2(
        A, b.transpose(1, 0, 2), bdy.transpose(1, 0, 2), bdx.transpose(1, 0, 2),
        g, NzT, DzT, block=256, interpret=True, layout="cz",
    )
    for x1, x3 in zip(r1, r3):
        assert float(jnp.abs(x1 - x3.transpose(1, 0, 2)).max()) < 1e-11
    # a skewed Jacobian must NOT be detected as diagonal
    assert detect_diag_geometry(np.asarray(Ji), np.asarray(w), S) is None


def _adiabatic_3d(inp, out):
    ops, _ = out
    ops[0][0, 1] = inp.normal[0]
    ops[0][0, 2] = inp.normal[1]
    ops[0][0, 3] = inp.normal[2]


@pytest.mark.parametrize("order,n1", [(2, 4), (4, 3), (6, 2)])
def test_lattice_faces_match_assembled(order, n1):
    """The flagship bench configuration (lattice volume + 4 value-only
    Neumann faces + Dirichlet) through the banded face path
    (``ops/lattice_sumfact.face_apply_banded``) must reproduce the assembled
    CSR matvec to f64 precision."""

    def build(strategy):
        mesh = lt.generate_mesh(
            lt.make_cube_mesh(np.linspace(0.0, 1.0, n1)), order=order
        )
        problem = lt.ProblemDefinition(4, [0])
        bcs = lt.BCDefinition(problem)
        bcs.define_dirichlet([5, 6], [0])
        params = lt.AlgebraicSystemParams(eval_strategy=strategy)
        system = lt.make_algebraic_system(mesh, problem, bcs, params)
        kd = lt.wrap_domain_equation_kernel(
            _diffusion_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
        )
        kn = lt.wrap_boundary_equation_kernel(
            _adiabatic_3d, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
        )
        system.begin_assembly()
        system.assemble_problem(kd, [0])
        system.assemble_problem(kn, [1, 2, 3, 4])
        system.end_assembly()
        return system

    s_mf = build(lt.OperatorEvaluationStrategy.MATRIX_FREE)
    s_as = build(lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(s_mf.n_dofs, 1)))
    y1 = s_mf.operator()(x)
    y2 = s_as.operator()(x)
    scale = float(jnp.abs(y2).max())
    assert float(jnp.abs(y1 - y2).max()) < 1e-11 * max(scale, 1.0)


@pytest.mark.parametrize("p,ne,qo", [(2, 3, 4), (4, 2, 10)])
def test_fused_z_sweep_var_parity(p, ne, qo):
    """The streamed variable-A mode of the v2 kernel (interpret mode) must
    match the dense-A v1 kernel in f64: nonzero (d,i,u) planes of a
    spatially-varying coefficient tensor ride per-tile VMEM blocks."""
    import jax.numpy as jnp

    from l3ster_tpu.ops.lattice_sumfact import _tabs
    from l3ster_tpu.ops.pallas_zsweep import fused_z_sweep
    from l3ster_tpu.ops.pallas_zsweep2 import fused_z_sweep_v2

    q1 = qo // 2 + 1
    nes = (ne,) * 3
    C = 4
    S = R = Q = ne * q1
    EQ = S * R * Q
    rng = np.random.default_rng(p + 100)
    dt = jnp.float64
    tabs = _tabs(p, qo, nes, dt)
    _, _, (NzT, DzT) = tabs
    n1z = ne * p + 1
    b = jnp.asarray(rng.normal(size=(n1z, C, R * Q)), dt)
    bdy = jnp.asarray(rng.normal(size=(n1z, C, R * Q)), dt)
    bdx = jnp.asarray(rng.normal(size=(n1z, C, R * Q)), dt)
    Ji = jnp.asarray(rng.normal(size=(3, 3, EQ)) * 0.1 + np.eye(3)[:, :, None], dt)
    w = jnp.asarray(rng.uniform(0.5, 1.0, EQ), dt)
    # spatially-varying A with ~60% structural zeros
    mask = rng.uniform(size=(4, 7, 4)) > 0.6
    A_t = rng.normal(size=(4, 7, 4, EQ)) * mask[..., None]
    nz = tuple(tuple(int(v) for v in ix) for ix in np.argwhere(mask))
    A_nz = jnp.asarray(np.stack([A_t[d, i, u] for d, i, u in nz]), dt)
    # oracle: the XLA nonzero-plane algebra on the same z-interpolated data
    from l3ster_tpu.algsys.local import _qp_algebra_nz

    bs = jnp.einsum("zcq,zS->Scq", b, NzT).reshape(S, C, R * Q)
    dz = jnp.einsum("zcq,zS->Scq", b, DzT).reshape(S, C, R * Q)
    dy = jnp.einsum("zcq,zS->Scq", bdy, NzT).reshape(S, C, R * Q)
    dx = jnp.einsum("zcq,zS->Scq", bdx, NzT).reshape(S, C, R * Q)
    vals_l = [bs[:, u].reshape(EQ) for u in range(C)]
    rd = [
        [dx[:, u].reshape(EQ) for u in range(C)],
        [dy[:, u].reshape(EQ) for u in range(C)],
        [dz[:, u].reshape(EQ) for u in range(C)],
    ]
    t0, tr = _qp_algebra_nz(nz, A_nz, 7, Ji, w, vals_l, rd, 3, C)
    t0m = jnp.stack(t0).reshape(C, S, R * Q)
    tzm = jnp.stack(tr[2]).reshape(C, S, R * Q)
    tym = jnp.stack(tr[1]).reshape(C, S, R * Q)
    txm = jnp.stack(tr[0]).reshape(C, S, R * Q)
    a_ref = jnp.einsum("cSq,zS->zcq", t0m, NzT) + jnp.einsum("cSq,zS->zcq", tzm, DzT)
    ady_ref = jnp.einsum("cSq,zS->zcq", tym, NzT)
    adx_ref = jnp.einsum("cSq,zS->zcq", txm, NzT)

    a, ady, adx = fused_z_sweep_v2(
        None, b, bdy, bdx, ("full", Ji.reshape(9, S, R * Q), w.reshape(S, R * Q)),
        NzT, DzT, block=256, interpret=True,
        var=(nz, A_nz.reshape(-1, S, R * Q), 7),
    )
    for got, ref in zip((a, ady, adx), (a_ref, ady_ref, adx_ref)):
        err = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-300))
        assert err < 1e-11, err


def test_lattice_multi_rhs_stacking():
    """n_rhs=2 through the lattice path (rhs lane-stacked as extra channels
    with a block-diagonal baked A) must equal per-column applies."""
    import l3ster_tpu as lt

    def build(n_rhs):
        mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0, 1, 4)), order=3)
        problem = lt.ProblemDefinition(4, [0])
        params = lt.AlgebraicSystemParams(
            eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE, n_rhs=n_rhs
        )
        s = lt.make_algebraic_system(mesh, problem, None, params)
        kd = lt.wrap_domain_equation_kernel(
            _diffusion_3d,
            lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4, n_rhs=n_rhs),
        )
        s.begin_assembly()
        s.assemble_problem(
            kd, [0], options=lt.AssemblyOptions(eval_strategy=LocalEvalStrategy.LATTICE_SF)
        )
        s.end_assembly()
        return s

    s2 = build(2)
    s1 = build(1)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(s2.n_dofs, 2)))
    y2 = s2.operator()(x)
    y_cols = jnp.concatenate(
        [s1.operator()(x[:, :1]), s1.operator()(x[:, 1:])], axis=1
    )
    assert float(jnp.abs(y2 - y_cols).max() / jnp.abs(y_cols).max()) < 1e-12


def test_structural_fn_cache_reassembly():
    """Re-assembling with CHANGED coefficient values must flow through the
    structurally-cached operator fn (same identity -> no re-trace) and still
    produce the new operator's values."""
    import l3ster_tpu as lt

    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0, 1, 3)), order=2)
    problem = lt.ProblemDefinition(4, [0])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
    )
    s = lt.make_algebraic_system(mesh, problem, None, params)

    def kern(scale):
        # VARIABLE coefficients: values ride the packed consts (A_nz planes),
        # so reassembly keeps the fn identity; a constant kernel would bake A
        # into the program (sig mismatch -> correct rebuild instead)
        def k(inp, out):
            ops, rhs = out
            A0, Ax, Ay, Az = ops
            w = scale * (1.0 + inp.point.x * inp.point.y)
            Ax[0, 1] = -w
            A0[1, 1] = -w
            Ax[1, 0] = w
            A0[2, 2] = -w
            Ay[2, 0] = w
            A0[3, 3] = -w
            Az[3, 0] = w
        return k

    def assemble(scale):
        kd = lt.wrap_domain_equation_kernel(
            kern(scale), lt.KernelParams(dimension=3, n_equations=4, n_unknowns=4)
        )
        s.begin_assembly()
        s.assemble_problem(kd, [0])
        s.end_assembly()

    x = jnp.asarray(np.random.default_rng(5).normal(size=(s.n_dofs, 1)))
    assemble(1.0)
    fn1, c1 = s.operator_parts()
    y1 = fn1(x, *c1)
    assemble(2.0)
    fn2, c2 = s.operator_parts()
    y2 = fn2(x, *c2)
    # same structure -> same fn identity (the no-retrace contract) ...
    assert fn1 is fn2
    # ... but the VALUES follow the new assembly (A scales by 2 -> the
    # least-squares operator A^T W A scales by 4)
    assert float(jnp.abs(y2 - 4.0 * y1).max() / jnp.abs(y1).max()) < 1e-12


def test_lattice_layout_operator_and_solve():
    """Channel-major (lattice-layout) Krylov path: ``operator_parts(
    layout="lattice")`` is bit-identical to the dof-layout operator under the
    layout permutation, and ``CG`` with a layout-capable preconditioner
    transparently solves in that layout (skipping the per-apply entry/exit
    transposes, ~60us/iteration on TPU at the flagship)."""
    import jax.numpy as jnp

    from bench import _adiabatic_3d, _diffusion_3d

    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0, 1, 4)), order=2)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
    )
    system = lt.make_algebraic_system(mesh, problem, bcs, params)
    kd = lt.wrap_domain_equation_kernel(
        lambda i, o: _diffusion_3d(i, o),
        lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4),
    )
    kn = lt.wrap_boundary_equation_kernel(
        lambda i, o: _adiabatic_3d(i, o),
        lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4),
    )
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x),
        lt.KernelParams(dimension=3, n_equations=1),
    )
    system.set_dirichlet_bc_values(kdir, [5, 6], [0])
    opts = lt.AssemblyOptions(eval_strategy=lt.LocalEvalStrategy.LATTICE_SF)
    system.begin_assembly()
    system.assemble_problem(kd, [0], options=opts)
    system.assemble_problem(kn, [1, 2, 3, 4])
    system.end_assembly()

    assert system.lattice_layout_key() == ((7, 7, 7), 343, 4)
    fn_d, cd = system.operator_parts()
    fn_l, cl = system.operator_parts(layout="lattice")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(system.n_dofs, 2)))
    yd = fn_d(x, *cd)
    yl = system.from_lattice_layout(fn_l(system.to_lattice_layout(x), *cl))
    assert float(jnp.abs(yd - yl).max()) < 1e-13
    # round-trip of the layout permutation
    assert float(
        jnp.abs(system.from_lattice_layout(system.to_lattice_layout(x)) - x).max()
    ) == 0.0

    r = system.solve(
        lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Jacobi())
    )
    assert r.tol < 1e-11
    x_lat = np.array(system.x).copy()
    # Chebyshev has no lattice-layout support -> same solve via the dof path
    system.set_solution_vector(system.x * 0)
    r2 = system.solve(
        lt.CG(
            lt.IterSolverOpts(tol=1e-12, max_iters=2000),
            precond=lt.Chebyshev(degree=1, eig_ratio=30.0),
        )
    )
    assert np.abs(np.array(system.x) - x_lat).max() < 1e-9
