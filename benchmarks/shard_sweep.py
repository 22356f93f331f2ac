"""Shard-count scaling sanity record (virtual CPU devices).

Times the box-decomposed flagship operator apply at P = 1/2/4/8 shards on
the 8-virtual-device CPU mesh. Absolute numbers are meaningless (CPU,
oversubscribed); the RATIOS catch O(P^2) communication regressions — the
per-apply cost should stay roughly flat (each shard does 1/P of the work
plus two plane exchanges, and the virtual devices share the same host).

Run: python benchmarks/shard_sweep.py   (forces CPU in-process)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.parallel.box import box_parallelize
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _adiabatic_3d, _diffusion_3d

    order = 4
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, 9)), order=order)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE),
    )
    kd = lt.wrap_domain_equation_kernel(
        _diffusion_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    kn = lt.wrap_boundary_equation_kernel(
        _adiabatic_3d, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    system.begin_assembly()
    system.assemble_problem(
        kd, [0],
        options=lt.AssemblyOptions(eval_strategy=lt.LocalEvalStrategy.LATTICE_SF),
    )
    system.assemble_problem(kn, [1, 2, 3, 4])
    system.end_assembly()

    out = {"n_dofs": system.n_dofs, "order": order}
    rng = np.random.default_rng(0)
    xg = rng.normal(size=(system.n_dofs, 1))
    for P in (1, 2, 4, 8):
        if P == 1:
            fn, cs = system.operator_parts()
            x = jnp.asarray(xg)
        else:
            box = box_parallelize(system, n_shards=P)
            fn, cs = box.operator_parts()
            x = jnp.asarray(box._to_slabs(xg))
        op = jax.jit(fn)
        y = op(x, *cs)
        jax.block_until_ready(y)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            y = op(y, *cs)
        jax.block_until_ready(y)
        out[f"apply_ms_P{P}"] = round((time.perf_counter() - t0) / reps * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
