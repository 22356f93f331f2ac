"""Decompose warm end_assembly's ~0.4 s host time (Karman transient system).

probe_karman_step_sync (2026-08-20, after the op-data caching) shows warm
steps at: end_asm_host 0.37-0.48 s with end_asm_sync = 0 -- the host call
BLOCKS while the device finishes.  Candidates: per-call re-tracing of the
jitted rhs/diag pass, argument transfer blocking, or a synchronous dispatch
through the axon tunnel.  This probe times, on the warm system:

  args_s      _rhs_args construction (content-hash cache hits)
  call1..3_s  repeated cache["small"] invocations with identical args
  sync_s      block_until_ready after the last call

Identical repeat calls re-trace only if the jit cache misses; if call2/3
are fast, the 0.4 s is the DEVICE program and dispatch is (partially)
synchronous.

Run: python benchmarks/probe_end_asm.py   (TPU, ~4 min)
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    import l3ster_tpu as lt
    from l3ster_tpu.models.kernels import (
        navier_stokes_outlet_bc,
        navier_stokes_uvop_2d,
    )
    from l3ster_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    DOMAIN, BOTTOM, TOP, INLET, OUTLET, CYLINDER = 0, 1, 2, 3, 4, 5
    IU, IV = 0, 1
    mesh = lt.make_cylinder_in_channel_2d(
        left_offset=6.0, right_offset=10.0, bottom_offset=4.0, top_offset=4.0,
        n_circumf=32, n_radial=8, n_left=5, n_right=16, n_bottom=5, n_top=5,
        q_radial=1.25, q_right=1.05,
    )
    mesh = lt.generate_mesh(mesh, order=3)
    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([INLET, BOTTOM, TOP, CYLINDER], [IU, IV])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.MATRIX_FREE
    )
    system = lt.make_algebraic_system(mesh, problem, bcs, params, dtype=jnp.float32)
    system.set_dirichlet_bc_values([0.0, 0.0], [BOTTOM, TOP, CYLINDER], [IU, IV])
    manager = lt.SolutionManager(mesh, 6)
    k_trans = navier_stokes_uvop_2d(1.0 / 150.0, dt=0.1)
    k_outlet = navier_stokes_outlet_bc(1.0 / 150.0)
    opts = lt.AssemblyOptions(value_order=1, derivative_order=1)

    def assemble():
        system.begin_assembly()
        system.assemble_problem(
            k_trans, [DOMAIN], manager.field_access([0, 1, 2, 3]), options=opts
        )
        system.assemble_problem(k_outlet, [OUTLET], dof_inds=(0, 1, 3))
        system.end_assembly()

    assemble()
    assemble()  # warm: programs compiled, device caches filled

    # reproduce _end_impl's internals
    small = [c for c in system._contribs]
    out = {}
    t0 = time.perf_counter()
    args = [system._rhs_args(c) for c in small]
    out["args_s"] = round(time.perf_counter() - t0, 4)

    jfn = system._end_cache["small"]
    rhs0 = system.rhs
    diag0 = jnp.zeros((system.n_dofs,), system.dtype)
    for k in range(3):
        t0 = time.perf_counter()
        r, d = jfn(rhs0, diag0, args)
        out[f"call{k + 1}_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    jax.block_until_ready((r, d))
    out["sync_s"] = round(time.perf_counter() - t0, 4)

    # and the op-data value pass (the eff_rhs resident)
    c_vol = next(c for c in system._contribs if c.field_access is not None)
    entry = system._op_data_cache.get(system._op_key(c_vol))
    if entry is not None and entry[0] == "jit":
        for k in range(2):
            t0 = time.perf_counter()
            od = entry[1](c_vol)
            out[f"opdata{k + 1}_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        jax.block_until_ready(od[1:4])
        out["opdata_sync_s"] = round(time.perf_counter() - t0, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
