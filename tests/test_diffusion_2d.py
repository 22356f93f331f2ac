"""End-to-end 2D diffusion convergence oracles.

The analog of ``tests/Diffusion2DAssembledTest.cpp`` / ``Diffusion2DMF.cpp``:
the reference's ``tests/Diffusion2D.hpp`` problem (unknowns T, qx, qy; exact
solution T = x, q = (1, 0)) solved across evaluation-strategy x solver
combinations, checking L2 errors against the analytic solution.
"""

import numpy as np
import pytest

import l3ster_tpu as lt

DOMAIN, BOTTOM, TOP, LEFT, RIGHT = 0, 1, 2, 3, 4


def diffusion_kernel_2d(inp, out):
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


def adiabatic_bc(inp, out):
    ops, _ = out
    ops[0][0, 1] = inp.normal[0]
    ops[0][0, 2] = inp.normal[1]


def _solve(eval_strategy, solver, order=2, n=5):
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, n)), order=order)
    problem = lt.ProblemDefinition(3, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT, RIGHT], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs, lt.AlgebraicSystemParams(eval_strategy=eval_strategy)
    )

    diffusion = lt.wrap_domain_equation_kernel(
        diffusion_kernel_2d, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )
    neumann = lt.wrap_boundary_equation_kernel(
        adiabatic_bc, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )
    dirichlet = lt.wrap_boundary_residual_kernel(
        lambda inp, out: out.__setitem__(0, inp.point.x), lt.KernelParams(dimension=2, n_equations=1)
    )

    opts = lt.AssemblyOptions(value_order=1, derivative_order=0)
    system.set_dirichlet_bc_values(dirichlet, [LEFT, RIGHT], [0])
    system.begin_assembly()
    system.assemble_problem(diffusion, [DOMAIN], options=opts)
    system.assemble_problem(neumann, [BOTTOM, TOP])
    system.end_assembly()
    system.solve(solver)

    manager = lt.SolutionManager(mesh, 3)
    system.update_solution([0, 1, 2], manager, [0, 1, 2])

    def error_kernel(inp, out):
        out[0] = inp.field_vals[0] - inp.point.x
        out[1] = inp.field_vals[1] - 1.0
        out[2] = inp.field_vals[2]

    err_dom = lt.wrap_domain_residual_kernel(
        error_kernel, lt.KernelParams(dimension=2, n_equations=3, n_fields=3)
    )
    err_bnd = lt.wrap_boundary_residual_kernel(
        error_kernel, lt.KernelParams(dimension=2, n_equations=3, n_fields=3)
    )
    fa = manager.field_access([0, 1, 2])
    e_dom = np.array(lt.compute_norm_l2(err_dom, mesh, [DOMAIN], fa, options=opts)).ravel()
    e_bnd = np.array(
        lt.compute_norm_l2(err_bnd, mesh, [BOTTOM, TOP, LEFT, RIGHT], fa)
    ).ravel()
    return e_dom, e_bnd


CASES = [
    ("assembled-cg-jacobi", lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY,
     lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Jacobi())),
    ("assembled-cg-chebyshev", lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY,
     lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Chebyshev())),
    ("assembled-gmres", lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY,
     lambda: lt.Gmres(lt.IterSolverOpts(tol=1e-12, max_iters=4000), precond=lt.Jacobi())),
    ("assembled-klu2", lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY, lt.Klu2),
    ("assembled-lapack", lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY, lt.Lapack),
    ("mf-cg-jacobi", lt.OperatorEvaluationStrategy.MATRIX_FREE,
     lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Jacobi())),
    ("mf-cg-identity", lt.OperatorEvaluationStrategy.MATRIX_FREE,
     lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000))),
]


@pytest.mark.parametrize("name,strategy,make_solver", CASES, ids=[c[0] for c in CASES])
def test_diffusion_2d(name, strategy, make_solver):
    e_dom, e_bnd = _solve(strategy, make_solver())
    assert np.linalg.norm(e_dom) < 1e-8, (name, e_dom)
    assert np.linalg.norm(e_bnd) < 1e-8, (name, e_bnd)


def test_diffusion_2d_higher_order():
    e_dom, _ = _solve(
        lt.OperatorEvaluationStrategy.MATRIX_FREE,
        lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=5000), precond=lt.Jacobi()),
        order=4,
        n=3,
    )
    assert np.linalg.norm(e_dom) < 1e-8


def test_pure_weak_bc_problem():
    """Example-02 style: all BCs weak (no strong Dirichlet), -div q = 1."""
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, 5)), order=2)
    problem = lt.ProblemDefinition(3, [DOMAIN])
    system = lt.make_algebraic_system(mesh, problem)

    def source_kernel(inp, out):
        ops, rhs = out
        A0, Ax, Ay = ops
        Ax[0, 1] = -1.0
        Ay[0, 2] = -1.0
        rhs[0] = 1.0
        A0[1, 1] = -1.0
        Ax[1, 0] = 1.0
        A0[2, 2] = -1.0
        Ay[2, 0] = 1.0
        Ax[3, 2] = 1.0
        Ay[3, 1] = -1.0

    def robin_bc(inp, out):
        ops, _ = out
        ops[0][0, 0] = 1.0
        ops[0][0, 1] = inp.normal[0]
        ops[0][0, 2] = inp.normal[1]

    domain_k = lt.wrap_domain_equation_kernel(
        source_kernel, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )
    bc_k = lt.wrap_boundary_equation_kernel(
        robin_bc, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )
    system.begin_assembly()
    system.assemble_problem(domain_k, [DOMAIN])
    system.assemble_problem(bc_k, [BOTTOM, TOP, LEFT, RIGHT])
    system.end_assembly()
    res = system.solve(lt.Klu2())
    assert res.tol < 1e-10
    # solution is nontrivial and finite
    x = np.array(system.solution_vector())
    assert np.isfinite(x).all() and np.abs(x).max() > 1e-3


def test_multi_rhs_pseudo_block():
    """n_rhs=2 through the full system API: two Dirichlet data sets solved
    simultaneously (pseudo-block CG), each reproducing its own exact solution
    (the Belos Block CG multivector semantics)."""
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, 4)), order=3)
    problem = lt.ProblemDefinition(3, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT, RIGHT], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs, lt.AlgebraicSystemParams(n_rhs=2)
    )
    kd = lt.wrap_domain_equation_kernel(
        diffusion_kernel_2d,
        lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3, n_rhs=2),
    )
    kn = lt.wrap_boundary_equation_kernel(
        adiabatic_bc, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3, n_rhs=2)
    )
    # Dirichlet data: column 0 -> T = x, column 1 -> T = 3x (array path)
    nd = system.dofmap.node_dof
    dof_node = np.full(system.n_dofs, -1, dtype=np.int64)
    for k in range(nd.shape[1]):
        has = nd[:, k] >= 0
        dof_node[nd[has, k]] = np.nonzero(has)[0]
    xb = np.asarray(mesh.node_coords)[dof_node[system.dirichlet_dofs], 0]
    system.set_dirichlet_bc_values(np.stack([xb, 3.0 * xb], axis=1))
    system.begin_assembly()
    system.assemble_problem(kd, [DOMAIN], options=lt.AssemblyOptions(value_order=1, derivative_order=0))
    system.assemble_problem(kn, [BOTTOM, TOP])
    system.end_assembly()
    res = system.solve(lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=3000), precond=lt.Jacobi()))
    assert res.tol < 1e-10
    for r, scale in ((0, 1.0), (1, 3.0)):
        man = lt.SolutionManager(mesh, 3)
        system.update_solution([0, 1, 2], man, [0, 1, 2], rhs_index=r)

        def err(i, o, s=scale):
            o[0] = i.field_vals[0] - s * i.point.x
            o[1] = i.field_vals[1] - s
            o[2] = i.field_vals[2]

        ek = lt.wrap_domain_residual_kernel(
            err, lt.KernelParams(dimension=2, n_equations=3, n_fields=3)
        )
        e = np.linalg.norm(
            np.asarray(lt.compute_norm_l2(ek, mesh, [DOMAIN], man.field_access([0, 1, 2]))).ravel()
        )
        assert e < 1e-8, (r, e)
