"""Per-round machine-readable validation record (VERDICT r3 item 7).

Runs the two credibility anchors end-to-end and writes
``VALIDATION_r0N.json`` at the repo root:

1. the Karman vortex-shedding Strouhal study on the real TPU (the
   reference's example-07 physics validation analog) — St must sit in the
   measured confined-cylinder band 0.26–0.28 with <1% flow-rate imbalance;
2. the scaled 8-shard 3D MMS regression on the virtual CPU mesh (the
   reference re-runs its MPI matrix every CI, ``tests/CMakeLists.txt:53-91``)
   — the distributed error must match single-shard to solver tolerance at
   the converged MMS magnitude, including the (4, 2) 2D shard grid.

Usage:  python benchmarks/run_validation.py [round_number]
Env:    VALIDATION_STEPS (default 250) — Strouhal study length;
        VALIDATION_SKIP_STROUHAL=1 / VALIDATION_SKIP_MMS=1 to run one half.
"""

from __future__ import annotations

import datetime
import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def run_strouhal(n_steps: int, matrix_free: bool = False, refine: int = 1) -> dict:
    """Each study runs in a SUBPROCESS: the direct anchor on the CPU-f64
    oracle backend, the matrix-free fast path on the live (TPU) backend —
    one process cannot switch backends after initialization.

    ``refine=2``: the 2x-refined (~104k dof) configuration where PMultigrid
    earns its 4.3x (VERDICT r4 item 7) — stepped with CG+PMG(lag='auto')."""
    code = r"""
import os, sys, json
os.environ["KARMAN_BACKEND"] = %r
sys.path.insert(0, %r)
import l3ster_tpu as lt
from karman_2d import strouhal_study
refine = %d
solver = None
if refine > 1:  # the PMG configuration under validation
    import jax
    tol = 1e-6 if jax.default_backend() == "tpu" else 1e-8
    solver = lt.CG(
        lt.IterSolverOpts(tol=tol, max_iters=4000, chunk=256),
        precond=lt.PMultigrid(lag="auto"),
    )
st, imbalance, v_sig = strouhal_study(
    n_steps=%d, verbose=False, matrix_free=%r, refine=refine, solver=solver
)
tail = v_sig[-60:]
print("VALJSON " + json.dumps({
    "strouhal": round(float(st), 4),
    "imbalance_pct": round(float(imbalance), 3),
    "limit_cycle_amplitude": [round(float(tail.min()), 3), round(float(tail.max()), 3)],
}))
""" % (
        "native" if matrix_free else "cpu", str(ROOT / "examples"),
        refine, n_steps, matrix_free,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(ROOT), timeout=7200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("VALJSON "):
            rec = json.loads(line[len("VALJSON "):])
            rec["n_steps"] = n_steps
            rec["matrix_free"] = matrix_free
            if refine > 1:
                rec["refine"] = refine
                rec["solver"] = "mf-cg-pmg(lag=auto)"
            rec["pass"] = bool(
                0.26 < rec["strouhal"] < 0.28 and rec["imbalance_pct"] < 1.0
            )
            return rec
    raise RuntimeError(
        f"strouhal produced no record:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def run_mms() -> dict:
    """Run the scaled MMS in a subprocess on the 8-device virtual CPU mesh
    (this process may already hold the TPU backend)."""
    code = r"""
import os, json
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, %r)
from tests.test_distributed_scaled import _solve_scaled
import l3ster_tpu as lt
# quick per-round config (p=3, 3^3 elements): single- vs 8-shard agreement,
# MMS convergence magnitude, and (4,2)-grid iteration parity.  The heavier
# p=4 sweep stays in tests/test_distributed_scaled.py -m slow.
cg = lambda: lt.CG(lt.IterSolverOpts(tol=1e-10, max_iters=4000), precond=lt.Jacobi())
e1, _, it1 = _solve_scaled(1, 4, 3, solver=cg())
e8, _, it8 = _solve_scaled(8, 4, 3, solver=cg())
eg, _, itg = _solve_scaled(8, 4, 3, partition_grid=(4, 2), solver=cg())
print("VALJSON " + json.dumps({
    "mms_err_1shard": e1, "mms_err_8shards": e8, "mms_err_grid42": eg,
    "agree": abs(e8 - e1) < 1e-7 * max(e1, 1e-12)
             and abs(eg - e1) < 1e-7 * max(e1, 1e-12),
    "converged": e1 < 5e-3,  # p=3 h=1/3 MMS magnitude (~h^4)
    "iters": [it1, it8, itg],
    "grid42_parity": abs(itg - it1) <= max(2, int(0.02 * it1)),
}))
""" % (str(ROOT),)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(ROOT), timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("VALJSON "):
            return json.loads(line[len("VALJSON "):])
    raise RuntimeError(f"MMS validation produced no record:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def run_distributed_karman() -> dict:
    """Run the distributed BDF2 Karman trajectory check (8 virtual CPU
    devices vs single-device) in a subprocess; records iteration parity."""
    code = r"""
import os, json
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, %r)
from tests.test_karman import test_karman_distributed_trajectory
test_karman_distributed_trajectory()
print("VALJSON " + json.dumps({"distributed_karman_trajectory": "pass"}))
""" % (str(ROOT),)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(ROOT), timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("VALJSON "):
            rec = json.loads(line[len("VALJSON "):])
            rec["pass"] = True
            return rec
    return {
        "pass": False,
        "error": (out.stdout[-1000:] + out.stderr[-1000:])[-2000:],
    }


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("VALIDATION_ROUND", "04")
    out = ROOT / f"VALIDATION_r{rnd}.json"
    rec: dict = {}
    if out.exists():  # merge: partial runs (skip flags) extend the record
        try:
            rec = json.loads(out.read_text())
        except Exception:
            rec = {}
    rec["round"] = rnd
    rec["timestamp"] = datetime.datetime.now().isoformat(timespec="seconds")

    def save(key, value):
        # incremental write: each phase lands on disk as it completes, so a
        # wall-clock-killed run still leaves a usable partial record
        rec[key] = value
        out.write_text(json.dumps(rec, indent=1) + "\n")
        print(f"{key}:", json.dumps(value), flush=True)

    if os.environ.get("VALIDATION_SKIP_MMS", "0") in ("0", "", "false"):
        save("scaled_mms", run_mms())
    if os.environ.get("VALIDATION_SKIP_DIST_KARMAN", "0") in ("0", "", "false"):
        save("distributed_karman", run_distributed_karman())
    if os.environ.get("VALIDATION_SKIP_STROUHAL", "0") in ("0", "", "false"):
        steps = int(os.environ.get("VALIDATION_STEPS", "250"))
        # the fast matrix-free path first (its 0.34 s/step makes a per-round
        # physics check cheap), then the assembled direct anchor
        save("strouhal_study_mf", run_strouhal(steps, matrix_free=True))
        if os.environ.get("VALIDATION_SKIP_DIRECT", "0") in ("0", "", "false"):
            save("strouhal_study", run_strouhal(steps))
    if os.environ.get("VALIDATION_REFINED", "0") not in ("0", "", "false"):
        # the 2x-refined (~104k dof) PMG configuration (VERDICT r4 item 7);
        # opt-in via VALIDATION_REFINED=1
        steps = int(os.environ.get("VALIDATION_STEPS", "250"))
        save(
            "strouhal_study_refined_pmg",
            run_strouhal(steps, matrix_free=True, refine=2),
        )
    print("wrote", out)


if __name__ == "__main__":
    main()
