"""Navier-Stokes (Karman) pipeline smoke test.

A miniature version of ``examples/karman_2d.py`` (reference example 07):
Picard steady solve + a couple of BDF2 steps on a deliberately coarse
cylinder-in-channel mesh.  Checks the machinery (nonlinear field coupling,
dof-subset boundary assembly, flux integrals), not flow accuracy -- LSFEM
mass conservation on this mesh is weak, so the threshold is loose.
"""

import numpy as np

import l3ster_tpu as lt
from l3ster_tpu.models.kernels import (
    flow_rate_bc,
    navier_stokes_outlet_bc,
    navier_stokes_uvop_2d,
)

DOMAIN, BOTTOM, TOP, INLET, OUTLET, CYLINDER = 0, 1, 2, 3, 4, 5


def test_karman_mini():
    mesh = lt.make_cylinder_in_channel_2d(
        left_offset=4.0, right_offset=6.0, bottom_offset=3.0, top_offset=3.0,
        n_circumf=16, n_radial=4, n_left=3, n_right=6, n_bottom=2, n_top=2,
        q_radial=1.3, q_right=1.1,
    )
    mesh = lt.generate_mesh(mesh, order=2)
    H = mesh.node_coords[:, 1].max()
    nu = 1.0 / 50.0

    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([INLET, BOTTOM, TOP, CYLINDER], [0, 1])
    system = lt.make_algebraic_system(mesh, problem, bcs)

    ks = navier_stokes_uvop_2d(nu)
    kt = navier_stokes_uvop_2d(nu, dt=0.2)
    ko = navier_stokes_outlet_bc(nu)
    kf = flow_rate_bc()
    opts = lt.AssemblyOptions(value_order=1, derivative_order=1)

    def prof(i, o):
        y = i.point.y
        o[0] = 1.5 * (1.0 - (y / H) ** 2)
        o[1] = 0.0

    ki = lt.wrap_boundary_residual_kernel(prof, lt.KernelParams(dimension=2, n_equations=2))
    system.set_dirichlet_bc_values([0.0, 0.0], [BOTTOM, TOP, CYLINDER], [0, 1])
    system.set_dirichlet_bc_values(ki, [INLET], [0, 1])

    man = lt.SolutionManager(mesh, 6)
    vel1, vel2 = [0, 1], [2, 3]
    solver = lt.Klu2()

    def flows(access):
        inflow = -float(lt.compute_integral(kf, mesh, [INLET], access)[0, 0])
        outflow = float(lt.compute_integral(kf, mesh, [OUTLET], access)[0, 0])
        return inflow, outflow

    for _ in range(4):
        system.begin_assembly()
        system.assemble_problem(ks, [DOMAIN], man.field_access(vel1), options=opts)
        system.assemble_problem(ko, [OUTLET], dof_inds=(0, 1, 3))
        system.end_assembly()
        system.solve(solver)
        system.update_solution([0, 1], man, vel1)
    system.update_solution([0, 1, 2, 3], man, vel2 + [4, 5])
    inflow, outflow = flows(man.field_access(vel1))
    assert inflow > 0 and np.isfinite(outflow)

    for _ in range(2):
        system.begin_assembly()
        system.assemble_problem(kt, [DOMAIN], man.field_access(vel1 + vel2), options=opts)
        system.assemble_problem(ko, [OUTLET], dof_inds=(0, 1, 3))
        system.end_assembly()
        system.solve(solver)
        system.update_solution([0, 1, 2, 3], man, vel2 + [4, 5])
        vel1, vel2 = vel2, vel1
    inflow, outflow = flows(man.field_access(vel1))
    # coarse-mesh LSFEM conservation: this mini config (2 transient steps on
    # the minimal mesh) measures 20.2% imbalance deterministically (f64 CPU,
    # 2026-08-18) -- the flow is not yet developed; 25% catches regressions.
    # The developed-flow validation is the -m slow Strouhal study (1.37%
    # steady imbalance on TPU, St=0.2667).
    assert inflow > 0 and abs(inflow - outflow) / inflow < 0.25
    x = np.asarray(man.values)
    assert np.isfinite(x).all()
    # walls & cylinder are no-slip
    wall_nodes = mesh.boundary_nodes_of([BOTTOM, TOP, CYLINDER])
    assert np.abs(x[wall_nodes, 0]).max() < 1e-10


def test_cylinder_mesh_geometry():
    m = lt.make_cylinder_in_channel_2d(
        left_offset=4.0, right_offset=6.0, bottom_offset=3.0, top_offset=3.0,
        n_circumf=16, n_radial=4, n_left=3, n_right=6, n_bottom=2, n_top=2,
    )
    assert set(m.boundary_views) == {1, 2, 3, 4, 5}
    # cylinder boundary nodes on the circle
    cyl = m.boundary_nodes_of([5])
    r = np.linalg.norm(m.node_coords[cyl][:, :2], axis=1)
    assert np.allclose(r, 0.5, atol=1e-12)
    # positive area, no tangled elements
    import jax.numpy as jnp

    from l3ster_tpu.algsys.local import domain_tables, element_geometry

    blk = m.domains[0][0]
    geom = element_geometry(domain_tables(blk.element_type, 1, 4), jnp.asarray(blk.vertices))
    assert float(jnp.min(geom.weights)) > 0


def test_extrusion_cylinder_3d():
    """extrude_to_3d: watertight hex mesh, all 7 boundaries resolved."""
    import jax.numpy as jnp

    from l3ster_tpu.algsys.local import domain_tables, element_geometry

    m = lt.make_cylinder_in_channel_3d(
        distz=np.linspace(-1, 1, 3),
        left_offset=4.0, right_offset=6.0, bottom_offset=3.0, top_offset=3.0,
        n_circumf=16, n_radial=4, n_left=3, n_right=6, n_bottom=2, n_top=2,
    )
    assert m.dim == 3
    assert set(m.boundary_views) == {1, 2, 3, 4, 5, 6, 7}
    blk = m.domains[0][0]
    g = element_geometry(domain_tables(blk.element_type, 1, 2), jnp.asarray(blk.vertices))
    w = np.asarray(g.weights)
    assert w.min() > 0
    # exact volume: (channel - shoelace polygon) * depth
    cyl2d = lt.make_cylinder_in_channel_2d(
        left_offset=4.0, right_offset=6.0, bottom_offset=3.0, top_offset=3.0,
        n_circumf=16, n_radial=4, n_left=3, n_right=6, n_bottom=2, n_top=2,
    )
    loop = cyl2d.domains[5][0]
    pts = cyl2d.node_coords[np.concatenate([loop.nodes[:, 0], loop.nodes[-1:, 1]])][:, :2]
    shoelace = 0.5 * abs(np.sum(pts[:-1, 0] * pts[1:, 1] - pts[1:, 0] * pts[:-1, 1]))
    expect = ((4 + 6) * (3 + 3) - shoelace) * 2.0
    assert abs(float(w.sum()) - expect) < 1e-9 * expect
    # high-order conversion keeps facet/parent node identity
    m2 = lt.generate_mesh(m, 2)
    assert np.array_equal(
        m2.boundary_nodes_of([5]), np.unique(m2.domains[5][0].nodes)
    )


def test_half_cylinder_mesh():
    """Half cylinder on the bottom wall: watertight, exact area, wall integrity."""
    m = lt.make_half_cylinder_in_channel_2d(
        left_offset=4.0, right_offset=6.0, top_offset=3.0,
        n_circumf=16, n_radial=4, n_left=3, n_right=6, n_top=2,
    )
    assert set(m.boundary_views) == {1, 2, 3, 4, 5, 6}
    import jax.numpy as jnp

    from l3ster_tpu.algsys.local import domain_tables, element_geometry

    blk = m.domains[0][0]
    g = element_geometry(domain_tables(blk.element_type, 1, 4), jnp.asarray(blk.vertices))
    w = np.asarray(g.weights)
    cyl = m.domains[2][0]
    pts = m.node_coords[np.concatenate([cyl.nodes[:, 0], cyl.nodes[-1:, 1]])][:, :2]
    poly = np.concatenate([pts, pts[:1]])
    half_poly = 0.5 * abs(np.sum(poly[:-1, 0] * poly[1:, 1] - poly[1:, 0] * poly[:-1, 1]))
    expect = (4 + 6) * 3 - half_poly
    assert w.min() > 0 and abs(w.sum() - expect) < 1e-9 * expect
    wall = m.boundary_nodes_of([1, 3])
    assert np.abs(m.node_coords[wall][:, 1]).max() < 1e-14
    r = np.linalg.norm(m.node_coords[m.boundary_nodes_of([2])][:, :2], axis=1)
    assert np.allclose(r, 0.5, atol=1e-12)


import pytest


@pytest.mark.slow
def test_karman_strouhal():
    """Physics validation (reference example 07 analog, DFG-2D-2-like config):
    sustained vortex shedding with a Strouhal number in the confined-cylinder
    band and <1% flow-rate imbalance.  ~25 min; run with `pytest -m slow`.
    Recorded result (2026-08-16): St=0.2667, imbalance 0.835%."""
    import sys
    sys.path.insert(0, "/root/repo/examples")
    from karman_2d import strouhal_study

    st, imbalance, v_sig = strouhal_study(n_steps=250, verbose=False)
    assert 0.25 < st < 0.35, f"Strouhal {st}"
    assert imbalance < 1.0, f"mass imbalance {imbalance}%"
    # the limit cycle must be saturated and roughly symmetric
    tail = v_sig[-60:]
    assert tail.max() > 0.5 and tail.min() < -0.5
