"""Padded point-cloud containers (TPU-native layout).

Design: instead of the reference's flat concatenation with per-point
``batch_ids`` (reference ``pc/Pointcloud.py:5-111``), every batch element
occupies its own row of a dense ``[B, N, ...]`` tensor padded to a static
``N`` with a boolean validity mask.  This gives XLA fully static shapes,
turns every scatter-style pooling of the reference into a masked reduction
over the ``N`` axis, and makes the batch axis directly shardable over a
device mesh (data parallelism).

Reference frames are an explicit axis: ``frames[B, N, F, 3, 3]`` with the
convention of reference ``pc/RotationFunctions.py:24-47``: a frame matrix
``R`` has the frame's basis vectors as *columns*; a world-space row-vector
``v`` is expressed in the local frame as ``v @ R`` (see
``change_direction_to_local_frame``, reference ``pc/RotationFunctions.py:637-665``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "PointCloud",
    "masked_mean",
    "masked_max",
    "masked_min",
    "masked_sum",
    "global_pool",
    "frame_pool",
    "bounding_boxes",
]


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Sum of ``x`` over ``axis`` counting only entries where ``mask``."""
    m = jnp.expand_dims(mask, tuple(range(mask.ndim, x.ndim)))
    return jnp.sum(jnp.where(m, x, 0.0), axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Mean of ``x`` over ``axis`` counting only entries where ``mask``."""
    m = jnp.expand_dims(mask, tuple(range(mask.ndim, x.ndim)))
    total = jnp.sum(jnp.where(m, x, 0.0), axis=axis)
    count = jnp.sum(m, axis=axis)
    return total / jnp.maximum(count, 1).astype(x.dtype)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Max of ``x`` over ``axis`` counting only entries where ``mask``."""
    m = jnp.expand_dims(mask, tuple(range(mask.ndim, x.ndim)))
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jnp.max(jnp.where(m, x, neg), axis=axis)


def masked_min(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Min of ``x`` over ``axis`` counting only entries where ``mask``."""
    m = jnp.expand_dims(mask, tuple(range(mask.ndim, x.ndim)))
    pos = jnp.finfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max
    return jnp.min(jnp.where(m, x, pos), axis=axis)


_POOLERS = {
    "sum": masked_sum,
    "avg": masked_mean,
    "max": masked_max,
    "min": masked_min,
}


class PointCloud(struct.PyTreeNode):
    """A batch of (optionally framed) padded point clouds.

    Attributes:
      positions: ``[B, N, 3]`` float point coordinates; padded rows arbitrary.
      mask: ``[B, N]`` bool; True for real points.
      frames: optional ``[B, N, F, 3, 3]`` per-point local reference frames
        (columns = frame axes). ``None`` for the non-equivariant path.

    Mirrors the roles of reference ``pc/Pointcloud.py`` and
    ``pc/PointcloudRotEquiv.py`` minus the per-point batch ids (implicit in
    the batch axis here).
    """

    positions: jnp.ndarray
    mask: jnp.ndarray
    frames: Optional[jnp.ndarray] = None

    @property
    def batch_size(self) -> int:
        return self.positions.shape[0]

    @property
    def capacity(self) -> int:
        """Static point capacity N (padded)."""
        return self.positions.shape[1]

    @property
    def num_frames(self) -> int:
        return 1 if self.frames is None else self.frames.shape[2]

    def num_valid(self) -> jnp.ndarray:
        """``[B]`` number of real points per batch element."""
        return jnp.sum(self.mask, axis=1)

    def with_frames(self, frames: jnp.ndarray) -> "PointCloud":
        return self.replace(frames=frames)


def global_pool(pc: PointCloud, x: jnp.ndarray, method: str = "avg") -> jnp.ndarray:
    """Pool per-point features to one vector per batch element.

    ``x`` is ``[B, N, C]`` or ``[B, N, F, C]``; frame rows of padded points
    are excluded via the point mask.  Mirrors reference
    ``pc/Pointcloud.py:58-76`` / ``pc/PointcloudRotEquiv.py:253-272``
    (there: scatter over batch ids; here: a masked reduction over N and,
    when present, F jointly).
    """
    pool = _POOLERS[method]
    if x.ndim == 4:  # [B, N, F, C] -> pool over (N, F) jointly
        b, n, f, c = x.shape
        mask = jnp.repeat(pc.mask, f, axis=1)
        return pool(x.reshape(b, n * f, c), mask, axis=1)
    return pool(x, pc.mask, axis=1)


def frame_pool(x: jnp.ndarray, method: str = "avg") -> jnp.ndarray:
    """Pool the frame axis of ``[B, N, F, C]`` features -> ``[B, N, C]``.

    The invariant-feature pooling of reference
    ``pc/PointcloudRotEquiv.py:224-251`` (``feature_pooling``): every frame
    of a point is real, so no mask is needed.
    """
    if method == "avg":
        return jnp.mean(x, axis=2)
    if method == "sum":
        return jnp.sum(x, axis=2)
    if method == "max":
        return jnp.max(x, axis=2)
    if method == "min":
        return jnp.min(x, axis=2)
    raise ValueError(f"unknown pooling method {method!r}")


def bounding_boxes(pc: PointCloud, eps: float = 1e-6):
    """Per-batch-element AABB, padded ``[B, 3]`` min / max.

    Reference ``pc/BoundingBox.py:6-27``: scatter min/max over batch ids
    with a +-1e-6 margin.
    """
    mins = masked_min(pc.positions, pc.mask, axis=1) - eps
    maxs = masked_max(pc.positions, pc.mask, axis=1) + eps
    return mins, maxs
