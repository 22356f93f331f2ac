"""The user-facing PDE kernel contract.

TPU-native analog of ``common/KernelInterface.hpp:13-57,178-204``: the user
describes a system of first-order PDEs

    A0(x) u + sum_d A_d(x) du/dx_d = f(x)

by a pointwise callback that fills the operator matrices ``A0..AD`` (each
n_equations x n_unknowns) and the right-hand side ``f`` (n_equations x n_rhs)
at a space-time point, optionally reading previously computed fields (values
and physical gradients).  The framework vmaps the callback over quadrature
points x elements, so everything the callback computes must be JAX-traceable.

Two authoring styles are supported:

* **fill style** (mirrors the reference examples 1:1): ``fn(inputs, out)``
  mutates ``out.operators[d][i, j] = value`` / ``out.rhs[i] = value``; the
  wrapper collects the entries and densifies them into jnp arrays.
* **functional style**: ``fn(inputs) -> (operators, rhs)`` returning a
  (dim+1, n_eq, n_unk) array (or list of dim+1 matrices) and an (n_eq, n_rhs)
  array directly.

Use :func:`wrap_domain_equation_kernel` and friends to wrap either style.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "KernelParams",
    "SpaceTimePoint",
    "DomainInput",
    "BoundaryInput",
    "EquationKernel",
    "ResidualKernel",
    "wrap_domain_equation_kernel",
    "wrap_boundary_equation_kernel",
    "wrap_domain_residual_kernel",
    "wrap_boundary_residual_kernel",
]


@dataclass(frozen=True)
class KernelParams:
    """Compile-time kernel signature (``common/KernelInterface.hpp:13-20``)."""

    dimension: int
    n_equations: int
    n_unknowns: int = 1
    n_fields: int = 0
    n_rhs: int = 1


class SpaceTimePoint(NamedTuple):
    """Physical-space evaluation point (``common/Structs.hpp:81``)."""

    space: jnp.ndarray  # (3,)
    time: jnp.ndarray  # scalar

    @property
    def x(self):
        return self.space[0]

    @property
    def y(self):
        return self.space[1]

    @property
    def z(self):
        return self.space[2]


class DomainInput(NamedTuple):
    field_vals: jnp.ndarray  # (n_fields,)
    field_ders: jnp.ndarray  # (dim, n_fields)
    point: SpaceTimePoint


class BoundaryInput(NamedTuple):
    field_vals: jnp.ndarray  # (n_fields,)
    field_ders: jnp.ndarray  # (dim, n_fields)
    point: SpaceTimePoint
    normal: jnp.ndarray  # (dim,)


class _Filler:
    """Mutable matrix facade collecting ``m[i, j] = value`` assignments."""

    def __init__(self, shape: tuple[int, ...]):
        self.shape = shape
        self.entries: dict[tuple[int, ...], object] = {}

    def _key(self, idx) -> tuple[int, ...]:
        if not isinstance(idx, tuple):
            idx = (idx,)
        idx = tuple(int(i) for i in idx)
        if len(idx) < len(self.shape):
            idx = idx + (0,) * (len(self.shape) - len(idx))
        if len(idx) != len(self.shape):
            raise IndexError(f"index {idx} invalid for shape {self.shape}")
        for i, n in zip(idx, self.shape):
            if not 0 <= i < n:
                raise IndexError(f"index {idx} out of bounds for shape {self.shape}")
        return idx

    def __setitem__(self, idx, value) -> None:
        self.entries[self._key(idx)] = value

    def __getitem__(self, idx):
        return self.entries.get(self._key(idx), 0.0)

    def densify(self, dtype) -> jnp.ndarray:
        out = jnp.zeros(self.shape, dtype=dtype)
        if not self.entries:
            return out
        keys = list(self.entries.keys())
        vals = jnp.stack([jnp.asarray(self.entries[k], dtype=dtype) for k in keys])
        idx = tuple(np.array([k[d] for k in keys]) for d in range(len(self.shape)))
        return out.at[idx].set(vals)


class _EquationOutput:
    """The ``out`` object handed to fill-style equation kernels."""

    def __init__(self, params: KernelParams):
        self.operators = [
            _Filler((params.n_equations, params.n_unknowns)) for _ in range(params.dimension + 1)
        ]
        self.rhs = _Filler((params.n_equations, params.n_rhs))

    def __iter__(self):  # allow `operators, rhs = out`
        return iter((self.operators, self.rhs))


def _densify_operators(ops, params: KernelParams, dtype) -> jnp.ndarray:
    if isinstance(ops, (list, tuple)):
        mats = [o.densify(dtype) if isinstance(o, _Filler) else jnp.asarray(o, dtype) for o in ops]
        out = jnp.stack(mats)
    else:
        out = jnp.asarray(ops, dtype)
    expected = (params.dimension + 1, params.n_equations, params.n_unknowns)
    if out.shape != expected:
        raise ValueError(f"kernel operators have shape {out.shape}, expected {expected}")
    return out


@dataclass(frozen=True)
class EquationKernel:
    """A wrapped equation kernel: evaluate(input) -> (operators, rhs)."""

    fn: Callable
    params: KernelParams
    is_boundary: bool
    fill_style: bool

    def evaluate(self, inputs, dtype=jnp.float64):
        p = self.params
        if self.fill_style:
            out = _EquationOutput(p)
            self.fn(inputs, out)
            ops = _densify_operators(out.operators, p, dtype)
            rhs = out.rhs.densify(dtype)
        else:
            ops_raw, rhs_raw = self.fn(inputs)
            ops = _densify_operators(ops_raw, p, dtype)
            rhs = jnp.asarray(rhs_raw, dtype).reshape(p.n_equations, p.n_rhs)
        return ops, rhs

    def __call__(self, inputs, dtype=jnp.float64):
        return self.evaluate(inputs, dtype)


@dataclass(frozen=True)
class ResidualKernel:
    """A wrapped residual kernel: evaluate(input) -> rhs (n_eq, n_rhs)."""

    fn: Callable
    params: KernelParams
    is_boundary: bool
    fill_style: bool

    def evaluate(self, inputs, dtype=jnp.float64):
        p = self.params
        if self.fill_style:
            out = _Filler((p.n_equations, p.n_rhs))
            self.fn(inputs, out)
            return out.densify(dtype)
        return jnp.asarray(self.fn(inputs), dtype).reshape(p.n_equations, p.n_rhs)

    def __call__(self, inputs, dtype=jnp.float64):
        return self.evaluate(inputs, dtype)


def _n_args(fn: Callable) -> int:
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return 2
    n = 0
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            n += 1
        elif p.kind == p.VAR_POSITIONAL:
            return 2
    return n


def wrap_domain_equation_kernel(fn: Callable, params: KernelParams) -> EquationKernel:
    return EquationKernel(fn, params, is_boundary=False, fill_style=_n_args(fn) >= 2)


def wrap_boundary_equation_kernel(fn: Callable, params: KernelParams) -> EquationKernel:
    return EquationKernel(fn, params, is_boundary=True, fill_style=_n_args(fn) >= 2)


def wrap_domain_residual_kernel(fn: Callable, params: KernelParams) -> ResidualKernel:
    return ResidualKernel(fn, params, is_boundary=False, fill_style=_n_args(fn) >= 2)


def wrap_boundary_residual_kernel(fn: Callable, params: KernelParams) -> ResidualKernel:
    return ResidualKernel(fn, params, is_boundary=True, fill_style=_n_args(fn) >= 2)
