"""Method-of-manufactured-solutions convergence study.

The credibility test every FEM framework needs: for a smooth manufactured
solution, the L2 error of the LSFEM solve must shrink at the optimal rate
~h^(p+1) under mesh refinement, for several polynomial orders.  (The
reference validates against exact polynomial solutions — e.g.
``tests/Diffusion2D.hpp`` — which only proves exactness, not rates.)

Problem: first-order Poisson system on (0,1)^2,
    u_exact = sin(pi x) sin(pi y),  q = grad u,
    div q = -2 pi^2 u_exact  (forcing),
with Dirichlet u on the whole boundary.
"""

import numpy as np
import pytest

import l3ster_tpu as lt

DOMAIN, BOTTOM, TOP, LEFT, RIGHT = 0, 1, 2, 3, 4
PI = np.pi


def _poisson_mms(inp, out):
    import jax.numpy as jnp

    ops, rhs = out
    A0, Ax, Ay = ops
    # eq 0: div q = f  ->  dqx/dx + dqy/dy = f
    Ax[0, 1] = 1.0
    Ay[0, 2] = 1.0
    # eq 1, 2: q - grad u = 0
    A0[1, 1] = 1.0
    Ax[1, 0] = -1.0
    A0[2, 2] = 1.0
    Ay[2, 0] = -1.0
    x, y = inp.point.x, inp.point.y
    rhs[0] = -2.0 * PI**2 * jnp.sin(PI * x) * jnp.sin(PI * y)


def _exact(inp, out):
    import jax.numpy as jnp

    x, y = inp.point.x, inp.point.y
    out[0] = jnp.sin(PI * x) * jnp.sin(PI * y)


def _solve_l2_error(order: int, n: int) -> float:
    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, n)), order=order)
    problem = lt.ProblemDefinition(3, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([BOTTOM, TOP, LEFT, RIGHT], [0])
    system = lt.make_algebraic_system(mesh, problem, bcs)
    kd = lt.wrap_domain_equation_kernel(
        _poisson_mms, lt.KernelParams(dimension=2, n_equations=3, n_unknowns=3)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        _exact, lt.KernelParams(dimension=2, n_equations=1)
    )
    system.set_dirichlet_bc_values(kdir, [BOTTOM, TOP, LEFT, RIGHT], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [DOMAIN])
    system.end_assembly()
    system.solve(lt.Klu2())
    man = lt.SolutionManager(mesh, 1)
    system.update_solution([0], man, [0])

    def err_k(i, o):
        _exact(i, o)
        o[0] = i.field_vals[0] - o[0]

    ek = lt.wrap_domain_residual_kernel(
        err_k, lt.KernelParams(dimension=2, n_equations=1, n_fields=1)
    )
    return float(lt.compute_norm_l2(ek, mesh, [DOMAIN], man.field_access([0]))[0, 0])


@pytest.mark.parametrize("order,expected_rate", [(1, 2.0), (2, 3.0), (3, 4.0)])
def test_h_convergence_rate(order, expected_rate):
    """L2(u) error must converge at ~h^(p+1)."""
    ns = [3, 5, 9]  # h, h/2, h/4
    errs = [_solve_l2_error(order, n) for n in ns]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    # the finer-mesh rate is the asymptotic one; allow 0.4 slack
    assert rates[-1] > expected_rate - 0.4, (errs, rates)


def test_p_convergence():
    """On a fixed mesh, raising p must reduce the error superlinearly
    (spectral convergence for the analytic manufactured solution)."""
    errs = [_solve_l2_error(p, 4) for p in (1, 2, 3, 4)]
    assert all(errs[i + 1] < errs[i] * 0.2 for i in range(len(errs) - 1)), errs
