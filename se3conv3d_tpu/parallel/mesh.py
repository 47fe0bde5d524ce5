"""Device-mesh utilities for data-parallel scale-out.

The reference has no multi-device story (SURVEY §2.6 — single GPU, no
torch.distributed); scale-out is a new first-class TPU component here:
a named 1-D ``data`` mesh, batches sharded over it, parameters/state
replicated, and XLA/GSPMD inserting the gradient all-reduces over ICI.
Works identically on a real v5e slice and on the virtual
``xla_force_host_platform_device_count`` CPU mesh used in tests.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "pad_batch_to_multiple",
]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch axis) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Device-put every array of a batch pytree with axis 0 sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_batch_to_multiple(batch: Any, multiple: int) -> Any:
    """Host-side pad of axis 0 to a device-count multiple.

    Padded examples keep zero masks, so they contribute nothing to masked
    losses/metrics."""

    def pad(x):
        b = x.shape[0]
        extra = (-b) % multiple
        if extra == 0:
            return x
        pad_width = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)

    return jax.tree_util.tree_map(pad, batch)
