"""Farthest-point subsampling (pure JAX, static output size).

Counterpart of reference ``pc/FPSSubSample.py:10-62`` (a torch_cluster
``fps`` wrapper).  Greedy FPS as a ``lax.fori_loop`` with a running
min-distance table — O(n_samples * N) with fully static shapes.  The
reference's ``__upsample_tensor__`` is an unimplemented TODO; here
upsampling gathers from the nearest selected point.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .pointcloud import PointCloud

__all__ = ["FPSMap", "fps_subsample", "fps_subsample_cloud"]


class FPSMap(struct.PyTreeNode):
    """Mapping from a cloud to its FPS subset.

    Attributes:
      ids: ``[B, S]`` selected source indices (clamped in-bounds).
      out_mask: ``[B, S]`` validity (S may exceed the valid point count).
      nearest: ``[B, N]`` index (into the S axis) of the closest selected
        point for every source point — the upsample map.
      src_mask: ``[B, N]``.
    """

    ids: jnp.ndarray
    out_mask: jnp.ndarray
    nearest: jnp.ndarray
    src_mask: jnp.ndarray

    def subsample(self, values: jnp.ndarray) -> jnp.ndarray:
        """Gather per-point values at the selected ids -> ``[B, S, ...]``."""
        return jax.vmap(lambda v, i: v[i])(values, self.ids)

    def upsample(self, values: jnp.ndarray) -> jnp.ndarray:
        """Broadcast ``[B, S, ...]`` values back to all source points via
        the nearest selected point."""
        return jax.vmap(lambda v, i: v[i])(values, self.nearest)


def fps_subsample(
    pc: PointCloud, n_samples: int, start_idx: int = 0
) -> FPSMap:
    """Greedy farthest-point selection of ``n_samples`` points per example."""

    def per_example(pos, mask):
        n = pos.shape[0]
        inf = jnp.asarray(jnp.inf, pos.dtype)
        first = jnp.asarray(start_idx, jnp.int32)

        def body(i, carry):
            ids, mind = carry
            cur = ids[i - 1]
            d2 = jnp.sum((pos - pos[cur]) ** 2, axis=-1)
            mind = jnp.minimum(mind, d2)
            masked = jnp.where(mask, mind, -inf)
            nxt = jnp.argmax(masked).astype(jnp.int32)
            return ids.at[i].set(nxt), mind

        ids0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(first)
        mind0 = jnp.full((n,), inf, pos.dtype)
        ids, _ = jax.lax.fori_loop(1, n_samples, body, (ids0, mind0))

        n_valid = jnp.sum(mask)
        out_mask = jnp.arange(n_samples) < jnp.minimum(n_valid, n_samples)

        # Upsample map: nearest selected point per source point.
        sel_pos = pos[ids]
        d2 = jnp.sum((pos[:, None, :] - sel_pos[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(out_mask[None, :], d2, inf)
        nearest = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        return ids, out_mask, nearest

    ids, out_mask, nearest = jax.vmap(per_example)(pc.positions, pc.mask)
    return FPSMap(ids=ids, out_mask=out_mask, nearest=nearest, src_mask=pc.mask)


def fps_subsample_cloud(pc: PointCloud, n_samples: int):
    """FPS-subsample a cloud; returns ``(sub_cloud, map)``."""
    fmap = fps_subsample(pc, n_samples)
    sub = PointCloud(positions=fmap.subsample(pc.positions), mask=fmap.out_mask)
    return sub, fmap
