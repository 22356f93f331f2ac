"""Profiling/tracing instrumentation.

Analog of the reference's compile-time-optional Caliper annotations
(``util/Caliper.hpp:4-13``, used throughout ``algsys/AssembledSystem.hpp:115,
362,417`` and ``algsys/SumFactorization.hpp:899``): named phase regions wall-
clocked into a process-wide accumulator, shown as ``jax.profiler`` trace
annotations when tracing, and (almost) free when profiling is off.  Phase
fences (``block_until_ready``) replace the reference's per-phase MPI barriers
(``algsys/AssembledSystem.hpp:120-122``) so wall time is attributable.

Enable with ``L3STER_TPU_PROFILE=1``: every instrumented phase (assembly
phases, operator setup, preconditioner setup, Krylov chunks, halo exchange
setup, MG levels) accumulates (count, total wall s) and a table prints to
stderr at process exit.  Programmatic access: :func:`profile_report`,
:func:`profile_reset`.  The solver verbosity path prints the same table per
solve (``IterSolverOpts(verbosity>=2)``).
"""

from __future__ import annotations

import atexit
import contextlib
import os
import sys
import time

import jax

__all__ = [
    "profile_region",
    "profile_enabled",
    "profile_report",
    "profile_reset",
    "phase_fence",
    "start_trace",
    "stop_trace",
    "Timer",
]

_PROFILE = os.environ.get("L3STER_TPU_PROFILE", "0") not in ("0", "", "false")

# name -> [count, total_seconds]; insertion-ordered = first-seen order
_ACC: dict[str, list] = {}


def profile_enabled() -> bool:
    return _PROFILE


def _record(name: str, dt: float) -> None:
    slot = _ACC.get(name)
    if slot is None:
        _ACC[name] = [1, dt]
    else:
        slot[0] += 1
        slot[1] += dt


@contextlib.contextmanager
def profile_region(name: str, *fence_arrays):
    """Named phase region.

    Wall-clock accounting is ALWAYS on (sub-microsecond cost; call sites are
    per-phase, never per-iteration) so the solver verbosity table works out
    of the box.  With ``L3STER_TPU_PROFILE=1`` the region additionally fences
    the given arrays on exit (device time attributed to the phase that queued
    it, the MPI-barrier analog) and opens a ``jax.profiler`` TraceAnnotation
    so the phase shows up in captured traces.
    """
    if not _PROFILE:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            _record(name, time.perf_counter() - t0)
        return
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence_arrays:
                phase_fence(*fence_arrays)
            _record(name, time.perf_counter() - t0)


def profile_report(reset: bool = False) -> str:
    """Per-phase table: count, total, mean -- sorted by total desc."""
    rows = sorted(_ACC.items(), key=lambda kv: -kv[1][1])
    lines = [f"{'phase':44s} {'count':>7s} {'total s':>10s} {'mean ms':>10s}"]
    for name, (n, tot) in rows:
        lines.append(f"{name:44s} {n:7d} {tot:10.3f} {tot / n * 1e3:10.2f}")
    if reset:
        profile_reset()
    return "\n".join(lines)


def profile_reset() -> None:
    _ACC.clear()


if _PROFILE:

    @atexit.register
    def _dump_profile():  # pragma: no cover - exercised via subprocess runs
        if _ACC:
            print("== l3ster_tpu phase profile ==", file=sys.stderr)
            print(profile_report(), file=sys.stderr)


def phase_fence(*arrays) -> None:
    """Synchronize before/after a measured phase (the MPI-barrier analog)."""
    if arrays:
        jax.block_until_ready(arrays)


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


class Timer:
    """Wall-clock phase timer with device fencing."""

    def __init__(self):
        self.laps: dict[str, float] = {}
        self._t0 = time.perf_counter()

    def lap(self, name: str, *fence_arrays) -> float:
        phase_fence(*fence_arrays)
        now = time.perf_counter()
        dt = now - self._t0
        self.laps[name] = self.laps.get(name, 0.0) + dt
        self._t0 = now
        return dt

    def report(self) -> str:
        total = sum(self.laps.values())
        lines = [f"{k:30s} {v * 1e3:10.2f} ms" for k, v in self.laps.items()]
        lines.append(f"{'total':30s} {total * 1e3:10.2f} ms")
        return "\n".join(lines)
