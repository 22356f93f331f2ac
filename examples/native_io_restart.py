"""Native checkpoint save/load with re-shard (reference example 08).

Solves 3D diffusion, checkpoints mesh + fields, reloads, and continues
postprocessing on a distributed system with a different shard count.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import numpy as np

import l3ster_tpu as lt
from l3ster_tpu.models.kernels import adiabatic_bc_3d, diffusion_3d


def main(path="/tmp/l3ster_ckpt"):
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0, 1, 3)), order=2)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    system = lt.make_algebraic_system(mesh, problem, bcs)
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=3, n_equations=1)
    )
    system.set_dirichlet_bc_values(kdir, [5, 6], [0])
    system.begin_assembly()
    system.assemble_problem(diffusion_3d(), [0])
    system.assemble_problem(adiabatic_bc_3d(), [1, 2, 3, 4])
    system.end_assembly()
    system.solve(lt.Klu2())
    manager = lt.SolutionManager(mesh, 4)
    system.update_solution([0, 1, 2, 3], manager, [0, 1, 2, 3])

    ckpt = lt.save(path, mesh, manager, field_names=["T", "qx", "qy", "qz"])
    print(f"saved {ckpt} ({os.path.getsize(ckpt)} bytes)")

    mesh2, manager2 = lt.load(ckpt)
    assert np.allclose(np.asarray(manager2.values), np.asarray(manager.values))
    # re-shard on load: build a distributed system on the restored mesh
    sys2 = lt.make_distributed_system(
        mesh2, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
        n_shards=min(4, len(jax.devices())),
    )
    print("restored and re-sharded:", sys2.describe())

    def err(i, o):
        o[0] = i.field_vals[0] - i.point.x

    ek = lt.wrap_domain_residual_kernel(err, lt.KernelParams(dimension=3, n_equations=1, n_fields=4))
    e = float(lt.compute_norm_l2(ek, mesh2, [0], manager2.field_access([0, 1, 2, 3]))[0, 0])
    print(f"restored-solution L2 error vs exact: {e:.2e}")
    assert e < 1e-8
    return e


if __name__ == "__main__":
    main()
    print("OK")
