"""Profiling/tracing helpers.

Analog of the reference's compile-time-optional Caliper annotations
(``util/Caliper.hpp``): named regions that show up in ``jax.profiler`` traces
when profiling is enabled, and no-op otherwise.  Phase fences
(``block_until_ready``) replace the reference's per-phase MPI barriers
(``algsys/AssembledSystem.hpp:120-122``).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

__all__ = ["profile_region", "phase_fence", "start_trace", "stop_trace", "Timer"]

_PROFILE = os.environ.get("L3STER_TPU_PROFILE", "0") not in ("0", "", "false")


@contextlib.contextmanager
def profile_region(name: str):
    """Named region: a jax.profiler TraceAnnotation when profiling is on."""
    if _PROFILE:
        with jax.profiler.TraceAnnotation(name):
            yield
    else:
        yield


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
