"""Host-CPU staging for x-independent setup math.

Through the remote-TPU tunnel every EAGER op costs a dispatch (~1.5 ms) plus
a remote compile for each new primitive specialization, and a host readback
blocks for seconds.  Operator setup (geometry packing, kernel-constancy
probes, banded-table packing) is x-independent math whose results travel to
the device as jit ARGUMENTS anyway — so compute it on the local CPU backend
and ship the finished tensors once.  Measured on the p=6 flagship
(2026-08-20): ``operator_parts`` 131 s -> ~2 s warm.

The reference pays no such tax (ahead-of-time C++), so this is part of
matching its zero-setup-cost model (SURVEY §6).
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["host_setup", "to_compute"]


def host_setup():
    """Context manager: run eager setup math on the host CPU backend.

    No-op when the default backend already is CPU (the f64 test
    configuration).  Arrays created inside are UNCOMMITTED, so they can be
    consumed by device jits; use :func:`to_compute` to place tensors that
    will be reused across calls (avoids a re-transfer per use).
    """
    try:
        if jax.default_backend() == "cpu":
            return contextlib.nullcontext()
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def to_compute(tree):
    """Move every jax-array leaf of ``tree`` to the default compute device.

    Non-array leaves (numpy arrays, strings, ints) pass through untouched;
    transfers are issued async and in one sweep.
    """
    if jax.default_backend() == "cpu":
        return tree
    dev = jax.devices()[0]

    def mv(x):
        if isinstance(x, jax.Array) and dev not in x.devices():
            return jax.device_put(x, dev)
        return x

    return jax.tree_util.tree_map(mv, tree)
