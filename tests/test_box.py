"""Structured box-decomposition tests (``parallel/box.py``).

The slab-decomposed operator must match the single-chip constrained operator
exactly (halo-exchange correctness), and the full solve must reproduce the
analytic solution on 2/4/8 shards.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import l3ster_tpu as lt
from l3ster_tpu.parallel.box import box_parallelize

DOMAIN, BACK, FRONT, BOTTOM, TOP, LEFT, RIGHT = 0, 1, 2, 3, 4, 5, 6


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


def _build(order=3, n=5):
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, n)), order=order)
    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    # Dirichlet-only well-posed setup for T = x, q = (1, 0, 0):
    # T on the x-faces, tangential-flux components on the other faces
    bcs.define_dirichlet([LEFT, RIGHT], [0])
    bcs.define_dirichlet([BOTTOM, TOP], [2])
    bcs.define_dirichlet([BACK, FRONT], [3])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
    )
    kd = lt.wrap_domain_equation_kernel(
        _diffusion_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=3, n_equations=1)
    )
    opts = lt.AssemblyOptions(
        value_order=1, derivative_order=0,
        eval_strategy=lt.LocalEvalStrategy.LATTICE_SF,
    )
    system.set_dirichlet_bc_values(kdir, [LEFT, RIGHT], [0])
    system.set_dirichlet_bc_values([0.0], [BOTTOM, TOP], [2])
    system.set_dirichlet_bc_values([0.0], [BACK, FRONT], [3])
    system.begin_assembly()
    system.assemble_problem(kd, [DOMAIN], options=opts)
    system.end_assembly()
    return mesh, system


@pytest.mark.parametrize("n_shards", [2, 4])
def test_box_operator_matches_single_chip(n_shards):
    mesh, system = _build()
    box = box_parallelize(system, n_shards=n_shards)
    rng = np.random.default_rng(0)
    xg = rng.normal(size=(system.n_dofs, 1))
    y_ref = np.asarray(system.operator()(jnp.asarray(xg, system.dtype)))
    x_st = jnp.asarray(box._to_slabs(xg), box.dtype)
    y_st = np.asarray(box.operator()(x_st))
    y_box = box._from_slabs(y_st)
    err = np.abs(y_box - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-12, err


@pytest.mark.parametrize("n_shards", [2, 4])
def test_box_solve(n_shards):
    mesh, system = _build()
    box = box_parallelize(system, n_shards=n_shards)
    res = box.solve(lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=lt.Jacobi()))
    assert res.tol < 1e-10
    manager = lt.SolutionManager(mesh, 4)
    box.update_solution([0, 1, 2, 3], manager, [0, 1, 2, 3])

    def err(i, o):
        o[0] = i.field_vals[0] - i.point.x
        o[1] = i.field_vals[1] - 1.0
        o[2] = i.field_vals[2]
        o[3] = i.field_vals[3]

    ek = lt.wrap_domain_residual_kernel(
        err, lt.KernelParams(dimension=3, n_equations=4, n_fields=4)
    )
    e = np.linalg.norm(
        np.asarray(
            lt.compute_norm_l2(ek, mesh, [DOMAIN], manager.field_access([0, 1, 2, 3]))
        ).ravel()
    )
    assert e < 1e-8, e


@pytest.mark.parametrize("n_shards", [2, 4])
def test_box_uneven_slabs(n_shards):
    # 3 z-element layers on 2/4 shards: trailing shard is short (P=2) or
    # empty (P=4) — the operator must still match single-chip exactly
    mesh, system = _build(order=2, n=4)
    box = box_parallelize(system, n_shards=n_shards)
    rng = np.random.default_rng(1)
    xg = rng.normal(size=(system.n_dofs, 1))
    y_ref = np.asarray(system.operator()(jnp.asarray(xg, system.dtype)))
    x_st = jnp.asarray(box._to_slabs(xg), box.dtype)
    y_st = np.asarray(box.operator()(x_st))
    y_box = box._from_slabs(y_st)
    err = np.abs(y_box - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-12, err


def _build_flagship(order=3, n=5):
    """The exact bench.py configuration: Neumann (adiabatic) faces 1-4,
    Dirichlet T on the x-faces — the previously-unsupported decomposed case."""
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, n)), order=order)
    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT, RIGHT], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
    )
    kd = lt.wrap_domain_equation_kernel(
        _diffusion_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )

    def adiabatic(inp, out):
        ops, _ = out
        ops[0][0, 1] = inp.normal[0]
        ops[0][0, 2] = inp.normal[1]
        ops[0][0, 3] = inp.normal[2]

    kn = lt.wrap_boundary_equation_kernel(
        adiabatic, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=3, n_equations=1)
    )
    opts = lt.AssemblyOptions(
        value_order=1, derivative_order=0,
        eval_strategy=lt.LocalEvalStrategy.LATTICE_SF,
    )
    system.set_dirichlet_bc_values(kdir, [LEFT, RIGHT], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [DOMAIN], options=opts)
    system.assemble_problem(kn, [BACK, FRONT, BOTTOM, TOP])
    system.end_assembly()
    return mesh, system


@pytest.mark.parametrize("n_shards,n", [(2, 5), (4, 5), (4, 4)])
def test_box_flagship_operator_matches_single_chip(n_shards, n):
    # includes boundary-face contributions: z faces (plane kind, owned by the
    # end shards) and y faces (strip kind, split along z); n=4 exercises
    # uneven slabs combined with faces
    mesh, system = _build_flagship(n=n)
    box = box_parallelize(system, n_shards=n_shards)
    rng = np.random.default_rng(2)
    xg = rng.normal(size=(system.n_dofs, 1))
    y_ref = np.asarray(system.operator()(jnp.asarray(xg, system.dtype)))
    x_st = jnp.asarray(box._to_slabs(xg), box.dtype)
    y_st = np.asarray(box.operator()(x_st))
    y_box = box._from_slabs(y_st)
    err = np.abs(y_box - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-12, err


def test_box_flagship_solve():
    # flagship config solved decomposed: T = x, q = (1,0,0) satisfies the
    # adiabatic faces (n.q = 0 on y/z faces) and the Dirichlet x-faces
    mesh, system = _build_flagship()
    box = box_parallelize(system, n_shards=4)
    res = box.solve(lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=lt.Jacobi()))
    assert res.tol < 1e-10
    manager = lt.SolutionManager(mesh, 4)
    box.update_solution([0, 1, 2, 3], manager, [0, 1, 2, 3])

    def err(i, o):
        o[0] = i.field_vals[0] - i.point.x
        o[1] = i.field_vals[1] - 1.0
        o[2] = i.field_vals[2]
        o[3] = i.field_vals[3]

    ek = lt.wrap_domain_residual_kernel(
        err, lt.KernelParams(dimension=3, n_equations=4, n_fields=4)
    )
    e = np.linalg.norm(
        np.asarray(
            lt.compute_norm_l2(ek, mesh, [DOMAIN], manager.field_access([0, 1, 2, 3]))
        ).ravel()
    )
    assert e < 1e-8, e


@pytest.mark.parametrize("grid,n", [((2, 2), 5), ((2, 4), 5), ((4, 2), 4), ((2, 2), 4)])
def test_box_pencil_operator_matches_single_chip(grid, n):
    # 2D (z x y) pencil decomposition incl. corner halo coupling through the
    # sequenced two-axis exchanges; n=4 exercises uneven windows on both axes
    mesh, system = _build(n=n)
    box = box_parallelize(system, n_shards=grid[0] * grid[1], grid=grid)
    rng = np.random.default_rng(3)
    xg = rng.normal(size=(system.n_dofs, 1))
    y_ref = np.asarray(system.operator()(jnp.asarray(xg, system.dtype)))
    x_st = jnp.asarray(box._to_slabs(xg), box.dtype)
    y_st = np.asarray(box.operator()(x_st))
    y_box = box._from_slabs(y_st)
    err = np.abs(y_box - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-12, err


@pytest.mark.parametrize("grid", [(2, 2), (2, 4)])
def test_box_pencil_flagship(grid):
    # flagship config (Neumann y/z faces + Dirichlet x) on a pencil grid:
    # faces are window-sliced across strips
    mesh, system = _build_flagship()
    box = box_parallelize(system, n_shards=grid[0] * grid[1], grid=grid)
    rng = np.random.default_rng(4)
    xg = rng.normal(size=(system.n_dofs, 1))
    y_ref = np.asarray(system.operator()(jnp.asarray(xg, system.dtype)))
    x_st = jnp.asarray(box._to_slabs(xg), box.dtype)
    y_st = np.asarray(box.operator()(x_st))
    y_box = box._from_slabs(y_st)
    err = np.abs(y_box - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-12, err


def test_box_pencil_solve():
    mesh, system = _build_flagship()
    box = box_parallelize(system, n_shards=4, grid=(2, 2))
    res = box.solve(lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=lt.Jacobi()))
    assert res.tol < 1e-10


@pytest.mark.parametrize("n_shards,grid,n", [(4, None, 5), (4, (2, 2), 5), (2, None, 4)])
def test_box_lowordermg_solve(n_shards, grid, n):
    """The headline preconditioner composed with the decomposed operator:
    CG + LowOrderMG on a BoxSystem (flagship config with Neumann faces) must
    hit the analytic solution in far fewer iterations than decomposed Jacobi.
    (2, None, 4): uneven slabs under the window-sliced restriction bands."""
    mesh, system = _build_flagship(n=n)
    box = box_parallelize(system, n_shards=n_shards, grid=grid)
    it_jac = box.solve(
        lt.CG(lt.IterSolverOpts(tol=1e-11, max_iters=3000), precond=lt.Jacobi())
    ).num_iters
    system.set_solution_vector(jnp.zeros_like(system.solution_vector()))
    res = box.solve(
        lt.CG(lt.IterSolverOpts(tol=1e-11, max_iters=3000), precond=lt.LowOrderMG())
    )
    assert res.tol < 1e-9
    assert res.num_iters < it_jac / 2, (res.num_iters, it_jac)
    manager = lt.SolutionManager(mesh, 4)
    box.update_solution([0, 1, 2, 3], manager, [0, 1, 2, 3])

    def err(i, o):
        o[0] = i.field_vals[0] - i.point.x
        o[1] = i.field_vals[1] - 1.0
        o[2] = i.field_vals[2]
        o[3] = i.field_vals[3]

    ek = lt.wrap_domain_residual_kernel(
        err, lt.KernelParams(dimension=3, n_equations=4, n_fields=4)
    )
    e = np.linalg.norm(
        np.asarray(
            lt.compute_norm_l2(ek, mesh, [DOMAIN], manager.field_access([0, 1, 2, 3]))
        ).ravel()
    )
    assert e < 1e-7, e


def test_box_lowordermg_matches_single_chip_iters():
    """Decomposed MG must be the SAME preconditioner as single-chip MG:
    iteration counts agree (the V-cycle algebra is identical; only the
    layout is decomposed)."""
    mesh, system = _build_flagship()
    mg = lt.LowOrderMG(smooth_degree=2)
    res_1 = system.solve(lt.CG(lt.IterSolverOpts(tol=1e-10, max_iters=500), precond=mg))
    x_1 = np.asarray(system.solution_vector()).copy()
    system.set_solution_vector(jnp.zeros_like(system.solution_vector()))
    box = box_parallelize(system, n_shards=4)
    res_4 = box.solve(lt.CG(lt.IterSolverOpts(tol=1e-10, max_iters=500), precond=mg))
    x_4 = np.asarray(system.solution_vector())
    assert abs(res_4.num_iters - res_1.num_iters) <= 2, (res_1.num_iters, res_4.num_iters)
    # both runs stop at the same relative-residual tol, so the solutions
    # agree to ~cond(A)*tol, not machine precision
    err = np.abs(x_4 - x_1).max() / max(np.abs(x_1).max(), 1e-30)
    assert err < 1e-6, err
