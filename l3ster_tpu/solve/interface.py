"""Solver interface types, analog of ``solve/SolverInterface.hpp``."""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["IterSolverOpts", "IterSolveResult"]


@dataclass(frozen=True)
class IterSolverOpts:
    """Options for iterative solvers (``solve/SolverInterface.hpp:26-37``).

    ``residual_scaling``: what normalizes the convergence residual —
    "rhs" (norm of b, the default), "initial" (norm of the initial
    residual), or "none" (absolute).  ``verbosity``: 0 silent, 1 prints a
    summary line per solve, >=2 streams per-iteration residuals.

    ``chunk``: 0 (default) runs the whole solve as ONE device program
    (fastest: no host sync until convergence).  ``chunk=k`` bounds each
    device program to k iterations and warm-restarts from the current
    iterate on the host until ``tol`` or ``max_iters`` — the analog of
    Belos' outer ``restarts`` (``solve/SolverInterface.hpp:26-37``).  Use it
    when a single program would run for minutes (e.g. many-thousand-level
    ILU triangular solves), where execution-time watchdogs can kill the
    device worker; each chunk boundary costs one host readback and, for CG,
    drops the conjugate direction (restarted CG — slightly more iterations).
    Incompatible with ``residual_scaling="initial"`` (each restart would
    re-normalize to its own initial residual).
    """

    tol: float = 1e-10
    max_iters: int = 5000
    restart: int = 50  # GMRES restart length
    verbosity: int = 0
    residual_scaling: str = "rhs"
    chunk: int = 0  # >0: bound each device program to this many iterations


@dataclass(frozen=True)
class IterSolveResult:
    """Outcome of an iterative solve (``solve/SolverInterface.hpp:39-43``).

    ``converged``: the achieved residual met the requested tolerance.
    ``capped``: the solve stopped because it hit ``max_iters`` WITHOUT
    converging — in a transient loop such a step silently pollutes the BDF2
    history, so iterative solvers emit a ``RuntimeWarning`` when this is set
    and stepping drivers should count it (``bench_karman_step`` reports
    ``cap_hits``).
    """

    tol: float  # achieved relative residual (max over right-hand sides)
    num_iters: int
    converged: bool = True
    capped: bool = False
