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
    points: int = 1,
) -> Mesh:
    """A device mesh for batch data parallelism, optionally 2-D.

    ``points > 1`` adds a second ``points`` axis sharding the point (N)
    dimension of every per-point array — the point-cloud analogue of
    sequence parallelism (SURVEY §5: points are the long-context axis).
    GSPMD inserts the cross-shard collectives the neighbor search and
    conv gathers need; use it when single-shard activations at large
    scene capacities exceed HBM.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    if points > 1:
        if len(devs) % points:
            raise ValueError(f"{len(devs)} devices not divisible by points={points}")
        arr = np.asarray(devs).reshape(len(devs) // points, points)
        return Mesh(arr, (axis_name, "points"))
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch axis) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Device-put every array of a batch pytree with axis 0 sharded.

    On a 2-D ``(data, points)`` mesh, per-point arrays (``ndim >= 2``:
    positions/mask/features/labels ``[B, N, ...]``) additionally shard
    axis 1 over ``points``; per-example arrays (``[B]``) shard axis 0
    only.
    """
    if "points" in mesh.axis_names:
        sh2 = NamedSharding(mesh, P(axis_name, "points"))
        sh1 = NamedSharding(mesh, P(axis_name))

        def put(x):
            return jax.device_put(x, sh2 if np.ndim(x) >= 2 else sh1)

        return jax.tree_util.tree_map(put, batch)
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
