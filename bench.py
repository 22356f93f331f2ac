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


# Official baseline stand-in (see PARITY.md "Baseline stand-in"): the
# reference cannot be built here (Trilinos/Eigen/Metis/hwloc/MPI absent, no
# network), so the recorded baseline is the ANALYTIC UPPER BOUND of its
# designated configuration — one MPI rank bound to one socket
# (benchmarks/CMakeLists.txt:26-54), stand-in socket 8 cores x AVX-512 x
# 2 FMA pipes x 3.0 GHz in the reference's own val_t = double
# (common/Typedefs.h:23): 8*2*8*2*3.0e9 = 768 GFLOP/s.  The reference could
# not exceed vs_baseline = 1.0 even at 100% FMA efficiency on the same
# algorithmic FLOP count.
BASELINE_SOCKET_F64_PEAK_GFLOPS = 768.0


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


def _retry(f, attempts=3):
    """Retry through transient axon-tunnel failures (remote_compile resets,
    'read body' truncation) -- a flaked dispatch must not kill the bench."""
    last = None
    for i in range(attempts):
        try:
            return f()
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            last = e
            msg = str(e)
            transient = any(
                s in msg for s in ("remote_compile", "read body", "UNAVAILABLE", "DEADLINE")
            )
            if not transient or i == attempts - 1:
                raise
            time.sleep(2.0 * (i + 1))
    raise last


def main() -> None:
    import os
    import sys

    t_start = time.perf_counter()
    budget = float(os.environ.get("L3STER_BENCH_BUDGET", "420"))

    def left() -> float:
        return budget - (time.perf_counter() - t_start)

    import jax
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    order = 6
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
    _retry(system.end_assembly)

    # the constrained operator in the layout the CG loop actually runs it:
    # channel-major (lattice) when available — the solver converts layouts
    # once per solve, so the per-iteration hot op has no entry/exit transpose
    layout = "lattice" if system.lattice_layout_key() is not None else "dof"
    fn, consts = (
        system.operator_parts(layout="lattice")
        if layout == "lattice"
        else system.operator_parts()
    )
    setup_s = time.perf_counter() - t_start

    q_order = lt.AssemblyOptions().quadrature_order(order)
    q1 = q_order // 2 + 1
    flops = _flops_per_apply(order, (n_1d - 1) ** 3, 4, 7, q1)

    def emit(dt: float, provisional: bool, extra: dict) -> None:
        """One full JSON record per line; the driver reads the LAST line, so
        each refinement strictly supersedes the previous print."""
        print(
            json.dumps(
                {
                    "metric": (
                        "matrix-free sum-factorized apply, 3D diffusion p=6 "
                        "6^3 hexes (4 unk)"
                    ),
                    "value": round(flops / dt / 1e9, 2),
                    "unit": "GFLOP/s",
                    # x (reference single-socket f64 FMA-peak upper bound);
                    # see BASELINE_SOCKET_F64_PEAK_GFLOPS above + PARITY.md
                    "vs_baseline": round(flops / dt / 1e9 / BASELINE_SOCKET_F64_PEAK_GFLOPS, 2),
                    "extra": {
                        "apply_ms": round(dt * 1e3, 3),
                        "provisional": provisional,
                        "setup_s": round(setup_s, 1),
                        "n_dofs": system.n_dofs,
                        "device": str(jax.devices()[0]),
                        "dtype": "float32",
                        "layout": layout,
                        **extra,
                    },
                }
            ),
            flush=True,
        )
        sys.stdout.flush()

    x = jnp.ones((system.n_dofs, 1), jnp.float32)

    # chained applies inside ONE jit -- exactly how the CG while_loop runs the
    # operator (per-call host->device dispatch through the remote tunnel costs
    # ~1.5ms and is not part of a solve).  The chain rescales each iterate
    # (data dependence; f32 stays bounded) and returns a scalar so the timed
    # region includes full execution.  The scalar readback costs ~29ms FIXED
    # through the tunnel, so total/K is only an UPPER bound on the per-apply
    # time; the honest number is the SLOPE between two chain lengths.
    #
    # The trip count K is a TRACED argument, so both chain lengths share ONE
    # executable: remote program loads through the tunnel cost minutes in a
    # degraded state (measured 263 s for a cache-HIT trivial matmul,
    # 2026-08-21), and a second compile+load once silently ate the whole
    # phase-2 budget.
    @jax.jit
    def chained(x, K, *cs):
        def body(i, v):
            v = fn(v, *cs)
            return v * (1.0 / jnp.maximum(jnp.sqrt(jnp.sum(v * v)), 1e-30))

        return jnp.sum(jax.lax.fori_loop(0, K, body, x))

    def chain_total(K, reps=4):
        """min-of-reps total runtime of a K-apply chain (the min rejects
        tunnel stalls, which only ever ADD time)."""
        Kd = jnp.asarray(K, jnp.int32)
        _retry(lambda: float(chained(x, Kd, *consts)))  # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(x, Kd, *consts))
            best = min(best, time.perf_counter() - t0)
        return best

    # Phase 1 (always): one K1 chain.  Its compile carries the whole
    # cold-cache operator compile; total/K1 is a pessimistic-but-valid
    # number printed IMMEDIATELY so the driver records something even if a
    # later phase dies or the budget runs out.
    K1, K2 = 256, 1024
    t_c1 = time.perf_counter()
    c1 = _retry(lambda: chain_total(K1))
    compile1_s = time.perf_counter() - t_c1  # ~all compile: exec is ~0.1 s
    emit(
        c1 / K1, True,
        {"timing": f"chain({K1}) total/K upper bound",
         "compile1_s": round(compile1_s, 1)},
    )

    # Phase 2 (budget-gated): second chain length -> slope timing; the last
    # printed line supersedes the provisional one.
    if left() > 45.0:
        try:
            t_c2 = time.perf_counter()
            c2 = _retry(lambda: chain_total(K2))
            dt = (c2 - c1) / (K2 - K1)
            if dt > 0:
                emit(
                    dt, False,
                    {"timing": f"slope chain({K2})-chain({K1})",
                     "compile1_s": round(compile1_s, 1),
                     "compile2_s": round(time.perf_counter() - t_c2, 1),
                     "elapsed_s": round(time.perf_counter() - t_start, 1)},
                )
            else:  # non-positive slope = tunnel stall artifact; keep the
                # provisional record but say so where the log shows it
                print(f"bench: non-positive slope ({dt:.3e}s), keeping provisional",
                      file=sys.stderr)
        except Exception as e:
            # provisional line already printed; a silent pass here once hid a
            # real phase-2 failure for a whole session
            print(f"bench phase 2 failed: {type(e).__name__}: {e}", file=sys.stderr)


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
