"""Node-major field storage and access.

Analogs of ``post/SolutionManager.hpp`` and ``post/FieldAccess.hpp``: computed
fields live in a (n_nodes, n_slots) device array, one column per scalar field;
kernels read them through a FieldAccess (a slot-index view) which the
assembler gathers per element block.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..mesh.core import Mesh

__all__ = ["SolutionManager", "FieldAccess"]


@dataclass
class FieldAccess:
    """A view of selected solution-manager slots; gathered at element nodes."""

    values: jnp.ndarray  # (n_nodes, n_slots_total)
    slots: tuple[int, ...]

    @property
    def n_fields(self) -> int:
        return len(self.slots)

    def gather(self, nodes: np.ndarray) -> jnp.ndarray:
        """(n_elem, n_nodes_el, n_fields) nodal field values for a block."""
        return self.values[jnp.asarray(nodes)][:, :, np.asarray(self.slots, dtype=np.int64)]


class SolutionManager:
    """Holds n_slots scalar nodal fields (``post/SolutionManager.hpp:12``)."""

    def __init__(self, mesh: Mesh, n_slots: int, dtype=jnp.float64):
        self.mesh = mesh
        self.n_slots = int(n_slots)
        self.dtype = dtype
        self.values = jnp.zeros((mesh.n_nodes, self.n_slots), dtype=dtype)

    @property
    def n_nodes(self) -> int:
        return self.values.shape[0]

    def field_access(self, slots) -> FieldAccess:
        slots = tuple(int(s) for s in slots)
        for s in slots:
            if not 0 <= s < self.n_slots:
                raise IndexError(f"slot {s} out of range [0, {self.n_slots})")
        return FieldAccess(self.values, slots)

    def get_field_view(self, slot: int) -> jnp.ndarray:
        return self.values[:, int(slot)]

    def set_field(self, slots, value) -> None:
        """Set slots to a constant or an (n_nodes,) / (n_nodes, len(slots)) array."""
        slots = np.asarray(list(slots) if np.ndim(slots) else [slots], dtype=np.int64)
        value = jnp.asarray(value, self.dtype)
        if value.ndim == 0:
            value = jnp.full((self.n_nodes, len(slots)), value, dtype=self.dtype)
        elif value.ndim == 1:
            value = jnp.broadcast_to(value[:, None], (self.n_nodes, len(slots)))
        self.values = self.values.at[:, slots].set(value)

    def set_fields_from_kernel(self, kernel, domain_ids, slots, field_access=None, time=0.0) -> None:
        """Evaluate a residual kernel at nodes (averaged at shared nodes) into slots.

        The analog of ``SolutionManager::setFields`` via
        ``algsys/ComputeValuesAtNodes.hpp``.
        """
        from ..algsys.values_at_nodes import compute_values_at_nodes

        vals, mask = compute_values_at_nodes(
            kernel, self.mesh, domain_ids, field_access=field_access, time=time, dtype=self.dtype
        )
        slots = np.asarray(list(slots), dtype=np.int64)
        if vals.shape[1] < len(slots):
            raise ValueError("kernel produces fewer components than slots requested")
        new = jnp.where(mask[:, None], vals[:, : len(slots), 0], self.values[:, slots])
        self.values = self.values.at[:, slots].set(new)
