"""Low-order-rediscretized multigrid preconditioner.

The TPU-native strong preconditioner for the matrix-free fast path (the
reference's matrix-free solves cap at Jacobi/Chebyshev; RILUK needs a
matrix).  Validates spectral-equivalence preconditioning: CG iteration
counts drop ~3x vs Jacobi with the analytic solution reproduced exactly.
"""

import numpy as np
import pytest

import l3ster_tpu as lt


def _diffusion2(inp, out):
    ops, rhs = out
    A0, Ax, Ay = ops
    Ax[0, 1] = -1.0
    Ay[0, 2] = -1.0
    A0[1, 1] = -1.0
    Ax[1, 0] = 1.0
    A0[2, 2] = -1.0
    Ay[2, 0] = 1.0
    Ax[3, 2] = 1.0
    Ay[3, 1] = -1.0


def _adiabatic2(inp, out):
    ops, _ = out
    ops[0][0, 1] = inp.normal[0]
    ops[0][0, 2] = inp.normal[1]


def _build_2d(order=4, n=5):
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, n)), order=order)
    problem = lt.ProblemDefinition(3, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([3, 4], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
    )
    kd = lt.wrap_domain_equation_kernel(
        _diffusion2, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )
    kn = lt.wrap_boundary_equation_kernel(
        _adiabatic2, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=2, n_equations=1)
    )
    opts = lt.AssemblyOptions(value_order=1, derivative_order=0)
    system.set_dirichlet_bc_values(kdir, [3, 4], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [0], options=opts)
    system.assemble_problem(kn, [1, 2])
    system.end_assembly()
    return mesh, system, opts


def test_lowordermg_2d_iterations_and_solution():
    mesh, system, opts = _build_2d()
    rj = system.solve(lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=lt.Jacobi()))
    system.set_solution_vector(system.x * 0)
    rm = system.solve(
        lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=lt.LowOrderMG(smooth_degree=3))
    )
    assert rm.tol < 1e-10
    # ~3x fewer iterations than Jacobi (301 -> 83 at p=4 on this mesh)
    assert rm.num_iters * 2 < rj.num_iters, (rm.num_iters, rj.num_iters)

    manager = lt.SolutionManager(mesh, 3)
    system.update_solution([0, 1, 2], manager, [0, 1, 2])

    def err(i, o):
        o[0] = i.field_vals[0] - i.point.x
        o[1] = i.field_vals[1] - 1.0
        o[2] = i.field_vals[2]

    ek = lt.wrap_domain_residual_kernel(
        err, lt.KernelParams(dimension=2, n_equations=3, n_fields=3)
    )
    e = np.array(
        lt.compute_norm_l2(ek, mesh, [0], manager.field_access([0, 1, 2]), options=opts)
    ).ravel()
    assert np.linalg.norm(e) < 1e-8


def test_lowordermg_exact_low_order_inverse():
    """n_levels=1 with a huge coarse cap = exact A_1^{-1}: the spectral
    equivalence floor (79 iterations on this problem)."""
    mesh, system, opts = _build_2d()
    r = system.solve(
        lt.CG(
            lt.IterSolverOpts(tol=1e-12, max_iters=3000),
            precond=lt.LowOrderMG(n_levels=1, coarse_max_dofs=10**7),
        )
    )
    assert r.tol < 1e-10
    assert r.num_iters < 120, r.num_iters


def test_lowordermg_3d():
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, 3)), order=3)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
    )

    def kd3(inp, out):
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

    def kn3(inp, out):
        ops, _ = out
        ops[0][0, 1] = inp.normal[0]
        ops[0][0, 2] = inp.normal[1]
        ops[0][0, 3] = inp.normal[2]

    kd = lt.wrap_domain_equation_kernel(
        kd3, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    kn = lt.wrap_boundary_equation_kernel(
        kn3, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    # CubeMeshIds: faces 5/6 are the x faces -> exact solution u = x
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=3, n_equations=1)
    )
    opts = lt.AssemblyOptions(value_order=1, derivative_order=0)
    system.set_dirichlet_bc_values(kdir, [5, 6], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [0], options=opts)
    system.assemble_problem(kn, [1, 2, 3, 4])
    system.end_assembly()
    rj = system.solve(lt.CG(lt.IterSolverOpts(tol=1e-11, max_iters=3000), precond=lt.Jacobi()))
    system.set_solution_vector(system.x * 0)
    rm = system.solve(
        lt.CG(lt.IterSolverOpts(tol=1e-11, max_iters=3000), precond=lt.LowOrderMG(smooth_degree=3))
    )
    assert rm.tol < 1e-9
    assert rm.num_iters < rj.num_iters, (rm.num_iters, rj.num_iters)

    manager = lt.SolutionManager(mesh, 4)
    system.update_solution([0, 1, 2, 3], manager, [0, 1, 2, 3])

    def err(i, o):
        o[0] = i.field_vals[0] - i.point.x

    ek = lt.wrap_domain_residual_kernel(
        err, lt.KernelParams(dimension=3, n_equations=1, n_fields=4)
    )
    e = np.array(
        lt.compute_norm_l2(ek, mesh, [0], manager.field_access([0, 1, 2, 3]), options=opts)
    ).ravel()
    assert np.linalg.norm(e) < 1e-7


def test_lowordermg_v11_cycle():
    """V(1,1) with the zero-initial-guess shortcut: 2 level-0 operator
    applies per V-cycle (the round-2 V(2,2) paid 5) while staying a
    symmetric preconditioner (same-degree Chebyshev pre/post), so CG
    convergence is guaranteed and iteration counts stay in the spectral-
    equivalence class."""
    mesh, system, opts = _build_2d()
    r = system.solve(
        lt.CG(
            lt.IterSolverOpts(tol=1e-12, max_iters=3000),
            precond=lt.LowOrderMG(smooth_degree=1),
        )
    )
    assert r.tol < 1e-10
    assert r.num_iters < 250, r.num_iters


def test_lowordermg_v02_nonsymmetric_cycle_gmres():
    """pre_degree=0 (V(0,k)) drops pre-smoothing AND the defect apply; the
    cycle is nonsymmetric, so it is exercised under GMRES."""
    mesh, system, opts = _build_2d()
    r = system.solve(
        lt.Gmres(
            lt.IterSolverOpts(tol=1e-11, max_iters=2000),
            precond=lt.LowOrderMG(smooth_degree=2, pre_degree=0),
        )
    )
    assert r.tol < 1e-9


def test_lowordermg_fine_level0():
    """fine_level0: smooth level 0 with the FINE order-p operator instead of
    a p=1 rediscretization on the full GLL lattice.  The V-cycle becomes a
    true MG cycle on A itself — iteration counts DROP (93 -> 49 at p=4 on
    this mesh) while the per-cycle cost falls too (the p1-on-GLL operator's
    QP space is larger than the fine operator's).  Auto-enabled for
    matrix-free systems; both settings must converge to the same answer."""
    mesh, system, opts = _build_2d()
    pre_old = lt.LowOrderMG(smooth_degree=2, fine_level0=False)
    r_old = system.solve(
        lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=pre_old)
    )
    x_old = np.array(system.x).copy()
    system.set_solution_vector(system.x * 0)
    pre_new = lt.LowOrderMG(smooth_degree=2, fine_level0=True)
    r_new = system.solve(
        lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=pre_new)
    )
    assert r_new.tol < 1e-10
    assert r_new.num_iters < r_old.num_iters, (r_new.num_iters, r_old.num_iters)
    assert np.abs(np.array(system.x) - x_old).max() < 1e-8
    # the auto default picks fine_level0 for matrix-free systems
    system.set_solution_vector(system.x * 0)
    r_auto = system.solve(
        lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=lt.LowOrderMG(smooth_degree=2))
    )
    assert abs(r_auto.num_iters - r_new.num_iters) <= 2, (r_auto.num_iters, r_new.num_iters)


def test_lowordermg_lattice_layout():
    """CG + LowOrderMG through the channel-major (lattice) solve path: the
    fine operator runs ``layout="lattice"`` (forced LATTICE_SF) while the p1
    levels fall back to per-apply permutations on CPU — the answer must
    match the dof-layout solve exactly (same preconditioner, same cycle)."""
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, 3)), order=3)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])

    from bench import _adiabatic_3d, _diffusion_3d

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

    def make(force_lattice):
        system = lt.make_algebraic_system(
            mesh, problem, bcs,
            lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
        )
        system.set_dirichlet_bc_values(kdir, [5, 6], [0])
        opts = (
            lt.AssemblyOptions(eval_strategy=lt.LocalEvalStrategy.LATTICE_SF)
            if force_lattice
            else lt.AssemblyOptions()
        )
        system.begin_assembly()
        system.assemble_problem(kd, [0], options=opts)
        system.assemble_problem(kn, [1, 2, 3, 4])
        system.end_assembly()
        return system

    s_lat = make(True)
    assert s_lat.lattice_layout_key() is not None
    pre = lt.LowOrderMG(smooth_degree=1)
    r1 = s_lat.solve(lt.CG(lt.IterSolverOpts(tol=1e-11, max_iters=3000), precond=pre))
    assert r1.tol < 1e-9
    x_lat = np.array(s_lat.x).copy()

    s_dof = make(False)
    assert s_dof.lattice_layout_key() is None
    r2 = s_dof.solve(lt.CG(lt.IterSolverOpts(tol=1e-11, max_iters=3000), precond=pre))
    assert abs(r1.num_iters - r2.num_iters) <= 2, (r1.num_iters, r2.num_iters)
    assert np.abs(np.array(s_dof.x) - x_lat).max() < 1e-7
