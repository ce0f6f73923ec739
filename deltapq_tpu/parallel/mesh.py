"""Device-mesh helpers.

The reference has no distributed layer at all (single-process OpenMP,
SURVEY.md §2.8); this is the new first-class component: a 1-D mesh over
all chips (across hosts when ``jax.distributed`` is initialized), with
the code array / DeltaTree partitions sharded along the database axis
and query batches replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "shard",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (all by default)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_rows(mesh: Mesh, axis_name: str = "shard") -> NamedSharding:
    """Rows of a [N, ...] array split across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_shards(x: np.ndarray, n_shards: int, fill=0) -> np.ndarray:
    """Pad axis 0 so it divides evenly across shards."""
    n = x.shape[0]
    pad = (-n) % n_shards
    if pad:
        padding = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        x = np.pad(x, padding, constant_values=fill)
    return x
