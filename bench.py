"""Headline benchmark: matrix-free sum-factorized operator apply throughput.

Mirrors the reference's ``benchmarks/Diffusion3DBenchmarkMatrixFree.cpp``
configuration (``benchmarks/Diffusion3D.hpp:8-24``): 3D diffusion on a p=6
hex cube with 6^3 elements, 4 unknowns / 7 equations.  Measures the full
constrained operator apply (gather + sum-factorized local apply + scatter +
Dirichlet masking) in float32 on the available accelerator and reports
GFLOP/s of useful work.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import time

import numpy as np


def _flops_per_apply(order: int, n_elems: int, n_unk: int, n_eq: int, q1: int) -> int:
    """Useful FLOPs of one sum-factorized constrained apply (3D)."""
    n = order + 1
    c = n_unk
    # backward sweep: 9 contractions (2 x-stage, 3 y-stage, 4 z-stage)
    f = 0
    f += 2 * (2 * n * n * q1 * c * n)  # x-stage: out (n,n,q1,c), len n
    f += 3 * (2 * n * q1 * q1 * c * n)  # y-stage
    f += 4 * (2 * q1 * q1 * q1 * c * n)  # z-stage
    Q = q1**3
    f += 2 * Q * 9 * c  # J^-T transform of derivatives
    f += 2 * Q * 4 * n_eq * c  # r = A g
    f += Q * n_eq  # weighting
    f += 2 * Q * 4 * n_eq * c  # t = A^T r
    f += 2 * Q * 9 * c  # J^-1 transform back
    # forward sweep mirrors the backward one
    f += 4 * (2 * q1 * q1 * n * c * q1)
    f += 3 * (2 * q1 * n * n * c * q1)
    f += 2 * (2 * n * n * n * c * q1)
    return f * n_elems


def main() -> None:
    import jax
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    order = 6
    import os

    # 6^3 elements as in benchmarks/Diffusion3D.hpp; override for scale
    # studies (e.g. L3STER_BENCH_N1D=13 -> 12^3 elements, 1.6M dofs)
    n_1d = int(os.environ.get("L3STER_BENCH_N1D", "7"))
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, n_1d)), order=order)
    problem = lt.ProblemDefinition(4, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([5, 6], [0])
    params = lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE)
    system = lt.make_algebraic_system(mesh, problem, bcs, params, dtype=jnp.float32)

    kd = lt.wrap_domain_equation_kernel(
        lambda i, o: _diffusion_3d(i, o), lt.KernelParams(dimension=3, n_equations=7, n_unknowns=4)
    )
    kn = lt.wrap_boundary_equation_kernel(
        lambda i, o: _adiabatic_3d(i, o), lt.KernelParams(dimension=3, n_equations=1, n_unknowns=4)
    )
    system.begin_assembly()
    system.assemble_problem(kd, [0])
    system.assemble_problem(kn, [1, 2, 3, 4])
    system.end_assembly()

    # the constrained operator in the layout the CG loop actually runs it:
    # channel-major (lattice) when available — the solver converts layouts
    # once per solve, so the per-iteration hot op has no entry/exit transpose
    layout = "lattice" if system.lattice_layout_key() is not None else "dof"
    fn, consts = (
        system.operator_parts(layout="lattice")
        if layout == "lattice"
        else system.operator_parts()
    )
    op = jax.jit(fn)
    x = jnp.ones((system.n_dofs, 1), jnp.float32)
    y = op(x, *consts)
    float(jnp.sum(y))  # compile + warmup (host readback: block_until_ready
    # returns EARLY through the axon tunnel; only a device->host transfer
    # of a result-dependent value forces completion)

    n_reps = 50
    t0 = time.perf_counter()
    for _ in range(n_reps):
        x = op(x, *consts)
    float(jnp.sum(x))
    dt_dispatch = (time.perf_counter() - t0) / n_reps

    # dispatch-free: chained applies inside ONE jit -- exactly how the CG
    # while_loop runs the operator (per-call host->device dispatch through
    # the remote tunnel costs ~1.5ms and is not part of a solve).  The chain
    # rescales each iterate (data dependence; f32 stays bounded) and returns a
    # scalar so the timed region includes full execution.  The scalar readback
    # itself costs ~29ms FIXED through the tunnel, so the per-apply time is
    # the SLOPE between two chain lengths, not total/K.
    def chain_total(K):
        @jax.jit
        def chained(x, *cs):
            def body(i, v):
                v = fn(v, *cs)
                return v * (1.0 / jnp.maximum(jnp.sqrt(jnp.sum(v * v)), 1e-30))
            return jnp.sum(jax.lax.fori_loop(0, K, body, x))

        float(chained(x, *consts))
        t0 = time.perf_counter()
        float(chained(x, *consts))
        t1 = time.perf_counter()
        float(chained(x, *consts))
        return min(t1 - t0, time.perf_counter() - t1)

    K1, K2 = 100, 400
    dt = (chain_total(K2) - chain_total(K1)) / (K2 - K1)

    from l3ster_tpu.quadrature.rules import get_quadrature
    from l3ster_tpu.mesh.traits import ElementType

    q_order = lt.AssemblyOptions().quadrature_order(order)
    q1 = q_order // 2 + 1
    flops = _flops_per_apply(order, (n_1d - 1) ** 3, 4, 7, q1)
    gflops = flops / dt / 1e9

    print(
        json.dumps(
            {
                "metric": "matrix-free sum-factorized apply, 3D diffusion p=6 6^3 hexes (4 unk)",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": None,
                "extra": {
                    "apply_ms": round(dt * 1e3, 3),
                    "apply_ms_with_dispatch": round(dt_dispatch * 1e3, 3),
                    "n_dofs": system.n_dofs,
                    "device": str(jax.devices()[0]),
                    "dtype": "float32",
                    "layout": layout,
                },
            }
        )
    )


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


if __name__ == "__main__":
    main()
