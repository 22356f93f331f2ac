"""Distributed 3D diffusion over a device mesh + sharded VTK export.

The multi-device user story (``comm/DistributeMesh.hpp`` +
``examples/02-diffusion-2D`` under ``mpiexec``): partition a generated cube
mesh across the available devices (RCB or the greedy graph partitioner),
solve the first-order diffusion system with distributed CG (halo exchanges
ride neighbor ``ppermute`` collectives inside one jitted ``shard_map``
program), then write one .vtu piece per shard + a .pvtu master.

Runs anywhere: forces the CPU backend with 8 virtual devices when no real
multi-device platform is present.

Run: python examples/distributed_diffusion.py [n_shards]
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import l3ster_tpu as lt
from l3ster_tpu.parallel.distributed import make_distributed_system

DOMAIN, BACK, FRONT, BOTTOM, TOP, LEFT, RIGHT = 0, 1, 2, 3, 4, 5, 6


def diffusion_3d(inp, out):
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


def adiabatic(inp, out):
    ops, _ = out
    ops[0][0, 1] = inp.normal[0]
    ops[0][0, 2] = inp.normal[1]
    ops[0][0, 3] = inp.normal[2]


def main(n_shards=4):
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, 4)), order=3)
    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([LEFT, RIGHT], [0])

    system = make_distributed_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
        n_shards=n_shards,
    )
    print(system.describe())

    kd = lt.wrap_domain_equation_kernel(
        diffusion_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    kn = lt.wrap_boundary_equation_kernel(
        adiabatic, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=3, n_equations=1)
    )
    system.set_dirichlet_bc_values(kdir, [LEFT, RIGHT], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [DOMAIN])
    system.assemble_problem(kn, [BACK, FRONT, BOTTOM, TOP])
    system.end_assembly()

    res = system.solve(
        lt.CG(lt.IterSolverOpts(tol=1e-10, max_iters=3000), precond=lt.Jacobi())
    )
    print(f"CG: {res.num_iters} iterations, residual {res.tol:.2e}")

    manager = lt.SolutionManager(mesh, 4)
    system.update_solution([0, 1, 2, 3], manager, [0, 1, 2, 3])

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
    print(f"L2 error vs exact solution: {e:.3e}")
    assert e < 1e-8, "distributed solve did not reproduce the exact solution"

    exporter = lt.PvtuExporter(mesh)
    export = lt.ExportDefinition("/tmp/distributed_diffusion.pvtu")
    export.define_field("T", [0])
    export.define_field("q", [1, 2, 3])
    path = exporter.export_solution_sharded(export, manager, partition=system)
    print(f"sharded export: {path} ({n_shards} pieces)")
    print("OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
