"""Unsteady 2D Karman vortex street -- the capstone example.

Reproduces the reference's ``examples/07-karman-2D``: incompressible
Navier-Stokes in velocity-vorticity-pressure form around a cylinder in a
channel; Picard-linearized steady solve as the initial condition, then BDF2
transient stepping with extrapolated advection velocity.  Flow-rate balance
between inlet and outlet is reported each step.

Run: python examples/karman_2d.py [n_steps] [coarse]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import l3ster_tpu as lt
from l3ster_tpu.models.kernels import (
    flow_rate_bc,
    navier_stokes_outlet_bc,
    navier_stokes_uvop_2d,
)

DOMAIN, BOTTOM, TOP, INLET, OUTLET, CYLINDER = 0, 1, 2, 3, 4, 5
IU, IV, IO, IP = 0, 1, 2, 3


def main(n_steps=20, coarse=True, mesh_order=2, verbose=True):
    dt = 0.1
    Re = 150.0
    nu = 1.0 * 1.0 / Re  # cylinder diameter * mean inlet velocity / Re

    if coarse:
        # note: least-squares FEM conserves mass only weakly; very coarse
        # meshes show visible inlet/outlet flow-rate imbalance (shrinks fast
        # under h/p refinement)
        mesh = lt.make_cylinder_in_channel_2d(
            left_offset=6.0, right_offset=10.0, bottom_offset=4.0, top_offset=4.0,
            n_circumf=32, n_radial=8, n_left=5, n_right=16, n_bottom=5, n_top=5,
            q_radial=1.25, q_right=1.05,
        )
        mesh_order = max(mesh_order, 3)
    else:
        mesh = lt.make_cylinder_in_channel_2d()
        mesh_order = 4
    mesh = lt.generate_mesh(mesh, order=mesh_order)
    H = mesh.node_coords[:, 1].max()

    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([INLET, BOTTOM, TOP, CYLINDER], [IU, IV])
    system = lt.make_algebraic_system(mesh, problem, bcs)
    if verbose:
        print(mesh.describe())
        print(system.describe())

    k_steady = navier_stokes_uvop_2d(nu)
    k_trans = navier_stokes_uvop_2d(nu, dt=dt)
    k_outlet = navier_stokes_outlet_bc(nu)
    k_flow = flow_rate_bc()
    asm_opts = lt.AssemblyOptions(value_order=1, derivative_order=1)

    def inlet_profile(inp, out):
        y = inp.point.y
        out[0] = 1.5 * (1.0 - (y / H) ** 2)
        out[1] = 0.0

    k_inlet = lt.wrap_boundary_residual_kernel(
        inlet_profile, lt.KernelParams(dimension=2, n_equations=2)
    )

    system.set_dirichlet_bc_values([0.0, 0.0], [BOTTOM, TOP, CYLINDER], [IU, IV])
    system.set_dirichlet_bc_values(k_inlet, [INLET], [IU, IV])

    manager = lt.SolutionManager(mesh, 6)
    vel1, vel2, vort, pres = [0, 1], [2, 3], [4], [5]
    solver = lt.Klu2()
    outlet_dofs = (IU, IV, IP)

    def flow_report(step, access):
        inflow = -float(lt.compute_integral(k_flow, mesh, [INLET], access)[0, 0])
        outflow = float(lt.compute_integral(k_flow, mesh, [OUTLET], access)[0, 0])
        if verbose:
            err = (inflow - outflow) / inflow * 100.0 if inflow else float("nan")
            print(f"{step:>6} | in {inflow:8.4f} | out {outflow:8.4f} | err {err:8.3f}%")
        return inflow, outflow

    # Picard iterations for the steady state
    for it in range(8):
        system.begin_assembly()
        system.assemble_problem(k_steady, [DOMAIN], manager.field_access(vel1), options=asm_opts)
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=outlet_dofs)
        system.end_assembly()
        system.solve(solver)
        system.update_solution([IU, IV], manager, vel1)
    system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)
    inflow, outflow = flow_report(0, manager.field_access(vel1))

    # BDF2 transient
    for step in range(1, n_steps + 1):
        system.begin_assembly()
        system.assemble_problem(
            k_trans, [DOMAIN], manager.field_access(vel1 + vel2), options=asm_opts
        )
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=outlet_dofs)
        system.end_assembly()
        system.solve(solver)
        system.update_solution([IU, IV, IO, IP], manager, vel2 + vort + pres)
        inflow, outflow = flow_report(step, manager.field_access(vel2))
        vel1, vel2 = vel2, vel1

    # export final snapshot
    exporter = lt.PvtuExporter(mesh)
    export = lt.ExportDefinition("/tmp/karman_final.pvtu")
    export.define_field("Velocity", vel1)
    export.define_field("Vorticity", vort)
    export.define_field("Pressure", pres)
    exporter.export_solution(export, manager)
    return inflow, outflow


if __name__ == "__main__":
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    coarse = (sys.argv[2] != "fine") if len(sys.argv) > 2 else True
    inflow, outflow = main(n_steps, coarse)
    err = abs(inflow - outflow) / inflow * 100.0
    print(f"final flow-rate imbalance: {err:.3f}%")
    assert err < 5.0, "flow rate not conserved"
    print("OK")
