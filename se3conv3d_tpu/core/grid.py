"""Voxel-grid subsampling with static shapes (pure JAX).

Replaces the reference's CUDA ``compute_keys`` kernel + ``torch.unique`` +
``torch_scatter`` pipeline (reference ``pc/Grid.py:38-58``,
``pc/GridSubSample.py:36-93``, ``custom_ops/ball_query/compute_keys.cu``)
with a sort/flag/cumsum compaction that XLA sees as one static-shape
program:

  1. per-point voxel key = linearised cell index (padded points -> INT_MAX),
  2. stable argsort of keys,
  3. run-start flags on the sorted keys, exclusive cumsum -> dense cell rank,
  4. scatter ranks back to original point order,
  5. segment-mean/max/count over cell ranks into a fixed capacity buffer.

The output cloud is padded to a static ``capacity`` (default: same as the
input) with a validity mask ``arange(capacity) < n_cells``.  Cell order is
ascending voxel key - identical to ``torch.unique(return_inverse=True)``
in the reference.

Keys are int32; the grid must satisfy ``prod(num_cells) < 2**31`` (true for
every shipped config: >= 0.04 m cells).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .pointcloud import PointCloud, masked_max, masked_min

__all__ = ["SubsampleMap", "build_grid_subsample", "grid_subsample_cloud"]

_INT32_MAX = jnp.iinfo(jnp.int32).max


class SubsampleMap(struct.PyTreeNode):
    """Mapping between a point cloud and its grid-subsampled version.

    Attributes:
      cell_id: ``[B, N]`` dense cell rank of every input point (valid points
        only; padded points carry an arbitrary in-range id and must be
        masked by ``src_mask``).
      src_mask: ``[B, N]`` validity of the *source* points.
      n_cells: ``[B]`` number of occupied cells per batch element.
      out_mask: ``[B, capacity]`` validity of the subsampled points.
      chosen_idx: ``[B, capacity]`` for random-sample mode: index of the one
        source point chosen per cell (reference ``GridSubSample.py:42-53``);
        for average mode it is unused (zeros).
      rnd: static flag - random-point-per-cell vs. cell-average semantics.
    """

    cell_id: jnp.ndarray
    src_mask: jnp.ndarray
    n_cells: jnp.ndarray
    out_mask: jnp.ndarray
    chosen_idx: jnp.ndarray
    rnd: bool = struct.field(pytree_node=False, default=False)

    @property
    def capacity(self) -> int:
        return self.out_mask.shape[-1]

    # --- pooling / upsampling -------------------------------------------

    def subsample(self, values: jnp.ndarray, method: str = "avg") -> jnp.ndarray:
        """Pool per-point ``[B, N, ...]`` values to ``[B, capacity, ...]``.

        Reference ``GridSubSample.__subsample_tensor__``
        (``pc/GridSubSample.py:56-73``): scatter-mean / scatter-max over cell
        ids, or a gather of the randomly chosen point in ``rnd`` mode.
        """
        if self.rnd:
            return jax.vmap(lambda v, i: v[i])(values, self.chosen_idx)
        if method == "avg":
            return _segment_mean(values, self.cell_id, self.src_mask, self.capacity)
        if method == "max":
            return _segment_max(values, self.cell_id, self.src_mask, self.capacity)
        raise ValueError(f"unknown subsample method {method!r}")

    def upsample(self, values: jnp.ndarray) -> jnp.ndarray:
        """Broadcast ``[B, capacity, ...]`` values back to the source points.

        Reference ``GridSubSample.__upsample_tensor__``
        (``pc/GridSubSample.py:75-93``); average mode = gather by cell id.
        """
        return jax.vmap(lambda v, i: v[i])(values, self.cell_id)


def _segment_reduce(fn, init, values, seg_ids, mask, num_segments):
    def per_example(v, s, m):
        vm = jnp.where(m.reshape(m.shape + (1,) * (v.ndim - 1)), v, init)
        s = jnp.where(m, s, num_segments - 1)  # masked values are `init`, harmless
        return fn(vm, s, num_segments)

    return jax.vmap(per_example)(values, seg_ids, mask)


def _segment_mean(values, seg_ids, mask, num_segments):
    def per_example(v, s, m):
        mf = m.astype(values.dtype)
        vm = v * mf.reshape(m.shape + (1,) * (v.ndim - 1))
        s = jnp.where(m, s, 0)
        total = jax.ops.segment_sum(vm, s, num_segments=num_segments)
        count = jax.ops.segment_sum(mf, s, num_segments=num_segments)
        return total / jnp.maximum(count, 1.0).reshape(count.shape + (1,) * (v.ndim - 1))

    return jax.vmap(per_example)(values, seg_ids, mask)


def _segment_max(values, seg_ids, mask, num_segments):
    neg = jnp.finfo(values.dtype).min if jnp.issubdtype(values.dtype, jnp.floating) \
        else jnp.iinfo(values.dtype).min
    return _segment_reduce(
        lambda v, s, n: jax.ops.segment_max(v, s, num_segments=n), neg,
        values, seg_ids, mask, num_segments,
    )


def _voxel_keys(positions: jnp.ndarray, mask: jnp.ndarray, cell_size: float) -> jnp.ndarray:
    """Per-example linearised voxel keys ``[N]`` (invalid -> INT32_MAX).

    Cell index math mirrors ``custom_ops/ball_query/grid_utils.cuh:56-93``:
    ``floor((p - aabb_min) / cell_size)`` clamped into the grid; the AABB has
    the +-1e-6 margin of reference ``pc/BoundingBox.py``.
    """
    mn = masked_min(positions, mask, axis=0) - 1e-6
    mx = masked_max(positions, mask, axis=0) + 1e-6
    num_cells = ((mx - mn) / cell_size).astype(jnp.int32) + 1
    cell = jnp.floor((positions - mn) / cell_size).astype(jnp.int32)
    cell = jnp.clip(cell, 0, num_cells - 1)
    key = (cell[:, 0] * num_cells[1] + cell[:, 1]) * num_cells[2] + cell[:, 2]
    return jnp.where(mask, key, _INT32_MAX)


def build_grid_subsample(
    pc: PointCloud,
    cell_size: float,
    rnd: bool = False,
    rng: Optional[jax.Array] = None,
    capacity: Optional[int] = None,
) -> SubsampleMap:
    """Compute the grid-subsample mapping for a padded cloud.

    Args:
      pc: input cloud ``[B, N, 3]``.
      cell_size: voxel edge length.
      rnd: pick one random point per cell instead of averaging (reference
        ``grid_rnd`` mode).
      rng: PRNG key, required when ``rnd``.
      capacity: static output capacity (default: N).
    """
    b, n = pc.mask.shape
    cap = capacity or n

    def per_example(pos, mask, key_rng):
        keys = _voxel_keys(pos, mask, cell_size)
        order = jnp.argsort(keys, stable=True)
        sorted_keys = keys[order]
        sorted_valid = mask[order]
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_keys[:-1]])
        is_first = (sorted_keys != prev) & sorted_valid
        rank_sorted = jnp.cumsum(is_first) - 1
        n_cells = jnp.sum(is_first)
        cell_id = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))
        cell_id = jnp.clip(cell_id, 0, cap - 1)
        out_mask = jnp.arange(cap) < n_cells

        if rnd:
            counts = jax.ops.segment_sum(
                is_first * 0 + sorted_valid.astype(jnp.int32),
                jnp.where(sorted_valid, rank_sorted, cap - 1).astype(jnp.int32),
                num_segments=cap,
            )
            starts = jnp.cumsum(counts) - counts
            u = jax.random.uniform(key_rng, (cap,))
            pick_sorted = starts + jnp.floor(u * counts).astype(jnp.int32)
            pick_sorted = jnp.clip(pick_sorted, 0, n - 1)
            chosen = order[pick_sorted]
        else:
            chosen = jnp.zeros((cap,), jnp.int32)
        return cell_id, n_cells, out_mask, chosen

    if rnd:
        if rng is None:
            raise ValueError("rnd grid subsample requires an rng key")
        rngs = jax.random.split(rng, b)
    else:
        rngs = jnp.zeros((b, 2), jnp.uint32)
    cell_id, n_cells, out_mask, chosen = jax.vmap(per_example)(
        pc.positions, pc.mask, rngs
    )
    return SubsampleMap(
        cell_id=cell_id,
        src_mask=pc.mask,
        n_cells=n_cells,
        out_mask=out_mask,
        chosen_idx=chosen,
        rnd=rnd,
    )


def grid_subsample_cloud(
    pc: PointCloud,
    cell_size: float,
    rnd: bool = False,
    rng: Optional[jax.Array] = None,
    capacity: Optional[int] = None,
):
    """Subsample a cloud; returns ``(sub_cloud, map)``.

    New positions are the cell averages (even in ``rnd`` mode the reference
    hierarchy uses avg positions only for non-rnd; in rnd mode positions are
    the chosen points' positions - reference ``train_dfaust_rot.py:145-151``
    uses ``__subsample_tensor__(pts, "avg")`` which in rnd mode gathers the
    chosen point).
    """
    smap = build_grid_subsample(pc, cell_size, rnd=rnd, rng=rng, capacity=capacity)
    new_pos = smap.subsample(pc.positions, "avg")
    sub = PointCloud(positions=new_pos, mask=smap.out_mask)
    return sub, smap
