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
    """

    tol: float = 1e-10
    max_iters: int = 5000
    restart: int = 50  # GMRES restart length
    verbosity: int = 0
    residual_scaling: str = "rhs"


@dataclass(frozen=True)
class IterSolveResult:
    """Outcome of an iterative solve (``solve/SolverInterface.hpp:39-43``)."""

    tol: float  # achieved relative residual (max over right-hand sides)
    num_iters: int
