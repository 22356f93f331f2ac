"""A/B slope timing: XY-Pallas stage pipeline vs XLA einsum stages.

One process, one chain executable per variant (traced trip count), flagship
shapes.  Run when the machine is QUIET — concurrent CPU jobs starve the
tunnel client (memory: a trivial cache-hit program took 263 s under load).

Usage: python benchmarks/probe_newpath.py [K1 K2]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


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


def _adiabatic_3d(inp, out):
    ops, _ = out
    ops[0][0, 1] = inp.normal[0]
    ops[0][0, 2] = inp.normal[1]
    ops[0][0, 3] = inp.normal[2]


def build(lt, jnp, with_faces=True):
    order, n_1d = 6, 7
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, n_1d)), order=order)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    params = lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE)
    system = lt.make_algebraic_system(mesh, problem, bcs, params, dtype=jnp.float32)
    kd = lt.wrap_domain_equation_kernel(
        _diffusion_3d, lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    kn = lt.wrap_boundary_equation_kernel(
        _adiabatic_3d, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    system.begin_assembly()
    system.assemble_problem(kd, [0])
    if with_faces:
        system.assemble_problem(kn, [1, 2, 3, 4])
    system.end_assembly()
    return system


def main() -> None:
    K1 = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K2 = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    import jax
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    def time_variant(name, env):
        for k, v in env.items():
            os.environ[k] = v
        t_build = time.perf_counter()
        system = build(lt, jnp)
        fn, consts = system.operator_parts(layout="lattice")
        x = system.to_lattice_layout(jnp.ones((system.n_dofs, 1), jnp.float32))

        @jax.jit
        def chained(x, K, *cs):
            def body(i, v):
                v = fn(v, *cs)
                return v * (1.0 / jnp.maximum(jnp.sqrt(jnp.sum(v * v)), 1e-30))

            return jnp.sum(jax.lax.fori_loop(0, K, body, x))

        t_c = time.perf_counter()
        float(chained(x, jnp.asarray(K1, jnp.int32), *consts))  # compile+load
        compile_s = time.perf_counter() - t_c

        def total(K):
            Kd = jnp.asarray(K, jnp.int32)
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(chained(x, Kd, *consts))
                best = min(best, time.perf_counter() - t0)
            return best

        c1, c2 = total(K1), total(K2)
        dt = (c2 - c1) / (K2 - K1)
        rec = {
            "variant": name,
            "apply_ms": round(dt * 1e3, 4),
            "upper_ms": round(c1 / K1 * 1e3, 4),
            "compile_s": round(compile_s, 1),
            "build_s": round(t_c - t_build, 1),
        }
        print(json.dumps(rec), flush=True)
        return rec

    time_variant("xy_pallas", {"L3STER_TPU_XY_PALLAS": "1"})
    time_variant("xla_stages", {"L3STER_TPU_XY_PALLAS": "0"})


if __name__ == "__main__":
    main()
