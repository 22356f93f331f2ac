"""End-to-end 3D diffusion (the benchmark problem family at small scale).

The reference's headline benchmark config (``benchmarks/Diffusion3D.hpp``):
4 unknowns (T, qx, qy, qz), 7 equations, hex cube.  Exact solution T = x,
q = (1, 0, 0) with Dirichlet T on left/right and adiabatic elsewhere.
"""

import numpy as np
import pytest

import l3ster_tpu as lt

DOMAIN, BACK, FRONT, BOTTOM, TOP, LEFT, RIGHT = 0, 1, 2, 3, 4, 5, 6


def diffusion_kernel_3d(inp, out):
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


def adiabatic_bc_3d(inp, out):
    ops, _ = out
    ops[0][0, 1] = inp.normal[0]
    ops[0][0, 2] = inp.normal[1]
    ops[0][0, 3] = inp.normal[2]


@pytest.mark.parametrize(
    "strategy", [lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY, lt.OperatorEvaluationStrategy.MATRIX_FREE]
)
def test_diffusion_3d(strategy):
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, 3)), order=2)
    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT, RIGHT], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs, lt.AlgebraicSystemParams(eval_strategy=strategy)
    )

    diffusion = lt.wrap_domain_equation_kernel(
        diffusion_kernel_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    neumann = lt.wrap_boundary_equation_kernel(
        adiabatic_bc_3d, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    dirichlet = lt.wrap_boundary_residual_kernel(
        lambda inp, out: out.__setitem__(0, inp.point.x), lt.KernelParams(dimension=3, n_equations=1)
    )
    opts = lt.AssemblyOptions(value_order=1, derivative_order=0)
    system.set_dirichlet_bc_values(dirichlet, [LEFT, RIGHT], [0])
    system.begin_assembly()
    system.assemble_problem(diffusion, [DOMAIN], options=opts)
    system.assemble_problem(neumann, [BACK, FRONT, BOTTOM, TOP])
    system.end_assembly()
    system.solve(lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=4000), precond=lt.Jacobi()))

    manager = lt.SolutionManager(mesh, 4)
    system.update_solution([0, 1, 2, 3], manager, [0, 1, 2, 3])

    def error_kernel(inp, out):
        out[0] = inp.field_vals[0] - inp.point.x
        out[1] = inp.field_vals[1] - 1.0
        out[2] = inp.field_vals[2]
        out[3] = inp.field_vals[3]

    err = lt.wrap_domain_residual_kernel(
        error_kernel, lt.KernelParams(dimension=3, n_equations=4, n_fields=4)
    )
    fa = manager.field_access([0, 1, 2, 3])
    e = np.array(lt.compute_norm_l2(err, mesh, [DOMAIN], fa, options=opts)).ravel()
    assert np.linalg.norm(e) < 1e-8, e
