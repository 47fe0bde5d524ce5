"""Dense-voxel MinkUNet34A counterpart (TPU-native baseline).

The reference ships an optional, import-guarded MinkowskiEngine sparse
U-Net baseline (``models/MinkUNet.py:32-447``: MinkUNet34A = BasicBlock,
LAYERS (2,3,4,6,2,2,2,2), PLANES (32,64,128,256,256,128,96,96,96),
INIT_DIM 32, k=5 stem, k=2/s=2 down+up, skip concats, 1x1 head, TensorField
UNWEIGHTED_AVERAGE quantization + slice-back).  Sparse gather/scatter convs
are a poor fit for the MXU; the TPU-native counterpart is a DENSE voxel
U-Net with identical block/channel schedule on a static ``[B, X, Y, Z, C]``
grid:

  * 3D convs lower to MXU-friendly ``conv_general_dilated``;
  * voxelization is a static scatter-mean (the reference's
    UNWEIGHTED_AVERAGE, ``MinkUNet.py:380-386``), devoxelization a gather
    (``slice``);
  * Minkowski's compute-at-occupied-sites-only semantics are emulated by
    masking activations with the (max-pooled) occupancy after every
    stage, and batch norms take occupancy-masked statistics
    (``nn/norm.py:MaskedBatchNorm`` over the flattened grid) — a
    documented approximation: empty sites carry zeros instead of being
    absent, so convs see zero-padding where the sparse engine sees
    nothing.  For a segmentation baseline the two agree wherever the
    receptive field is interior to the occupied set.

Points outside the static grid are clamped to its boundary voxels.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.norm import MaskedBatchNorm

__all__ = ["MinkUNet34A", "voxelize", "devoxelize"]

LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)
PLANES = (32, 64, 128, 256, 256, 128, 96, 96, 96)
INIT_DIM = 32


def voxelize(positions, mask, features, cell: float, dims: Tuple[int, int, int]):
    """Scatter-mean features onto a dense grid.

    Args:
      positions: ``[B, N, 3]``; mask: ``[B, N]``; features: ``[B, N, C]``.
      cell: voxel edge (the reference's ``p_radius`` quantization scale).
      dims: static grid dims (X, Y, Z); out-of-range coords are clamped.
    Returns:
      (grid ``[B, X, Y, Z, C]``, occ ``[B, X, Y, Z]`` bool,
       flat_idx ``[B, N]`` int32 — each point's voxel, for devoxelize).
    """
    b, n, c = features.shape
    dims_arr = jnp.asarray(dims, jnp.int32)
    # Per-example masked min-corner origin: clouds with negative
    # coordinates (e.g. after CenterAug) must not collapse into boundary
    # voxels (same origin handling as _grid_topk_neighbors).
    big = jnp.asarray(jnp.finfo(positions.dtype).max, positions.dtype)
    origin = jnp.min(
        jnp.where(mask[..., None], positions, big), axis=1, keepdims=True
    )
    coords = jnp.floor((positions - origin) / cell).astype(jnp.int32)
    coords = jnp.clip(coords, 0, dims_arr - 1)
    flat = (coords[..., 0] * dims[1] + coords[..., 1]) * dims[2] + coords[..., 2]
    nvox = dims[0] * dims[1] * dims[2]
    # masked-out points go to a trash voxel past the grid
    flat = jnp.where(mask, flat, nvox)

    def one(f_b, flat_b):
        sums = jnp.zeros((nvox + 1, c), f_b.dtype).at[flat_b].add(f_b)
        cnt = jnp.zeros((nvox + 1,), jnp.float32).at[flat_b].add(1.0)
        mean = sums / jnp.maximum(cnt, 1.0)[:, None]
        return mean[:-1], cnt[:-1] > 0

    grid, occ = jax.vmap(one)(features, flat)
    return (
        grid.reshape(b, *dims, c),
        occ.reshape(b, *dims),
        jnp.where(mask, flat, 0).astype(jnp.int32),
    )


def devoxelize(grid, flat_idx):
    """Gather per-point features back from the grid (``slice`` semantics)."""
    b = grid.shape[0]
    c = grid.shape[-1]
    flat_grid = grid.reshape(b, -1, c)
    return jax.vmap(lambda g, i: g[i])(flat_grid, flat_idx)


class _MaskedBN(nn.Module):
    """BatchNorm over occupied voxels only (Minkowski BN normalizes over
    the sparse sites; dense BN over the full grid would be dominated by
    empties)."""

    features: int

    @nn.compact
    def __call__(self, x, occ, train: bool):
        b = x.shape[0]
        c = x.shape[-1]
        flat = x.reshape(b, -1, c)
        m = occ.reshape(b, -1)
        out = MaskedBatchNorm(features=self.features)(flat, m, train)
        return out.reshape(x.shape)


def _conv(features, kernel, stride=1):
    return nn.Conv(
        features, kernel_size=(kernel,) * 3, strides=(stride,) * 3,
        padding="SAME", use_bias=False,
    )


def _convtr(features):
    return nn.ConvTranspose(
        features, kernel_size=(2,) * 3, strides=(2,) * 3, use_bias=False
    )


def _pool_occ(occ):
    """Occupancy for the 2x-downsampled grid (any occupied child)."""
    b = occ.shape[0]
    x = occ.astype(jnp.float32)[..., None]
    x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
    return x[..., 0] > 0


class _BasicBlock(nn.Module):
    """ResNet BasicBlock (reference ``MinkUNet.py:33-85``)."""

    planes: int

    @nn.compact
    def __call__(self, x, occ, train: bool):
        residual = x
        out = _conv(self.planes, 3)(x)
        out = _MaskedBN(self.planes)(out, occ, train)
        out = nn.relu(out)
        out = _conv(self.planes, 3)(out)
        out = _MaskedBN(self.planes)(out, occ, train)
        if residual.shape[-1] != self.planes:
            residual = _conv(self.planes, 1)(residual)
            residual = _MaskedBN(self.planes)(residual, occ, train)
        out = nn.relu(out + residual)
        return out * occ[..., None]


class MinkUNet34A(nn.Module):
    """Dense-voxel MinkUNet34A (reference ``MinkUNet.py:440-441``).

    Call: ``model(positions [B,N,3], mask [B,N], features [B,N,C],
    train=) -> logits [B, N, num_classes]``.
    """

    num_classes: int
    cell: float = 0.1
    grid_dims: Tuple[int, int, int] = (96, 48, 96)

    def _stage_blocks(self, n, planes, x, occ, train):
        for _ in range(n):
            x = _BasicBlock(planes)(x, occ, train)
        return x

    @nn.compact
    def __call__(self, positions, mask, features, train: bool = False):
        grid, occ0, flat_idx = voxelize(
            positions, mask, features, self.cell, self.grid_dims
        )

        def down(x, occ, planes):
            x = _conv(planes, 2, stride=2)(x)
            occ2 = _pool_occ(occ)
            x = _MaskedBN(planes)(x, occ2, train)
            return nn.relu(x) * occ2[..., None], occ2

        def up(x, occ_target, planes):
            x = _convtr(planes)(x)
            x = _MaskedBN(planes)(x, occ_target, train)
            return nn.relu(x) * occ_target[..., None]

        # stem (k=5 conv at stride 1)
        x = _conv(INIT_DIM, 5)(grid)
        x = _MaskedBN(INIT_DIM)(x, occ0, train)
        out_p1 = nn.relu(x) * occ0[..., None]

        # encoder
        x, occ1 = down(out_p1, occ0, INIT_DIM)
        out_b1 = self._stage_blocks(LAYERS[0], PLANES[0], x, occ1, train)
        x, occ2 = down(out_b1, occ1, PLANES[0])
        out_b2 = self._stage_blocks(LAYERS[1], PLANES[1], x, occ2, train)
        x, occ3 = down(out_b2, occ2, PLANES[1])
        out_b3 = self._stage_blocks(LAYERS[2], PLANES[2], x, occ3, train)
        x, occ4 = down(out_b3, occ3, PLANES[2])
        x = self._stage_blocks(LAYERS[3], PLANES[3], x, occ4, train)

        # decoder with skip concats
        x = up(x, occ3, PLANES[4])
        x = jnp.concatenate([x, out_b3], axis=-1)
        x = self._stage_blocks(LAYERS[4], PLANES[4], x, occ3, train)
        x = up(x, occ2, PLANES[5])
        x = jnp.concatenate([x, out_b2], axis=-1)
        x = self._stage_blocks(LAYERS[5], PLANES[5], x, occ2, train)
        x = up(x, occ1, PLANES[6])
        x = jnp.concatenate([x, out_b1], axis=-1)
        x = self._stage_blocks(LAYERS[6], PLANES[6], x, occ1, train)
        x = up(x, occ0, PLANES[7])
        x = jnp.concatenate([x, out_p1], axis=-1)
        x = self._stage_blocks(LAYERS[7], PLANES[7], x, occ0, train)

        # head: final 1x1 -> PLANES[8], then pred MLP (MinkUNet.py:233-252)
        x = nn.Conv(PLANES[8], kernel_size=(1,) * 3, use_bias=True)(x)
        h = nn.Conv(PLANES[8], kernel_size=(1,) * 3, use_bias=False)(x)
        h = _MaskedBN(PLANES[8])(h, occ0, train)
        h = nn.relu(h)
        # no bias: reference out_pred_2 is a MinkowskiConvolution with the
        # default bias=False (MinkUNet.py:248-252)
        logits = nn.Conv(self.num_classes, kernel_size=(1,) * 3, use_bias=False)(h)
        return devoxelize(logits, flat_idx)
