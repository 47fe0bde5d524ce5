"""Point-cloud hierarchy construction (jitted, static shapes).

Replaces the reference's per-batch hierarchy build — ``create_hierarchy``
(reference ``tasks/SemSeg/train_dfaust_rot.py:108-158``),
``pc/PointHierarchy.py:10-93`` and ``pc/PointHierarchyRotEquiv.py:7-44`` —
with one pure function ``build_hierarchy`` over padded ``[B, N, 3]`` clouds:

  1. grid-subsample the raw cloud at ``init_cell_size`` (cell average),
  2. optionally attach per-point reference frames to the result (PCA over a
     kNN/ball neighborhood, or uniform random — reference
     ``pc/PointcloudRotEquiv.py:77-178``),
  3. repeatedly grid-subsample at ``cell_sizes[i]``, attaching fresh frames
     to every level (each level re-samples its own frames from its own
     neighborhoods, like ``PointHierarchyRotEquiv``),
  4. optionally build a separate *output* cloud by random-point-per-cell
     subsampling of the raw cloud (``output_subsample`` semantics of
     ``train_dfaust_rot.py:142-156``), with its own frames.

Every level has a static ``capacity``; validity is tracked by masks.  The
whole build is jit-compatible (no data-dependent shapes), so the reference's
"all under torch.no_grad() preprocessing" becomes part of the single
compiled step.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .frames import (
    global_pca_frames,
    is_fixed_axis,
    pca_frames,
    pca_frames_from_components,
    random_frames,
    shuffle_and_select_frames,
)
from .grid import SubsampleMap, build_grid_subsample
from .neighborhoods import (
    SUBSAMPLED_SPACING_FACTOR,
    ball_query_neighborhood,
    knn_neighborhood,
)
from .pointcloud import PointCloud

__all__ = [
    "FrameConfig",
    "HierarchyConfig",
    "Hierarchy",
    "attach_frames",
    "build_hierarchy",
    "rotate_cloud",
    "rotate_hierarchy",
    "random_rotate_hierarchy",
]


@dataclasses.dataclass(frozen=True)
class FrameConfig:
    """Static frame-sampling configuration.

    The analogue of the reference's ``Model.RefFrames`` YAML sub-dict
    (consumed by ``PointcloudRotEquiv.__init__``, reference
    ``pc/PointcloudRotEquiv.py:16-52``):

      * ``n_frames``: frames per point kept after shuffling (1, 2 or 4).
      * ``pca``: PCA frames from a local neighborhood vs. uniform random.
      * ``fixed_axis``: False for free SO(3) frames; 1 or 2 to pin that world
        axis (SO(2) regime; axis 0 is unreachable in the reference too).
      * ``neigh_method`` / ``neigh_k`` / ``bq_radius``: neighborhood used for
        the PCA covariance (shipped configs: knn, k=16).
    """

    n_frames: int = 2
    pca: bool = True
    fixed_axis: object = False
    neigh_method: str = "knn"
    neigh_k: int = 16
    bq_radius: float = 0.0
    global_frames: bool = False

    def with_n_frames(self, n: int) -> "FrameConfig":
        return dataclasses.replace(self, n_frames=n)


@dataclasses.dataclass(frozen=True)
class HierarchyConfig:
    """Static hierarchy configuration.

    Mirrors the ``Model`` YAML keys ``init_subsample`` / ``grid_subsamples``
    / ``output_subsample`` of the reference configs (e.g.
    ``confs/dfaust/dfaust_I_rot_pca_2F.yaml``).

    Attributes:
      init_cell_size: voxel size of the initial subsample (level 0).
      cell_sizes: voxel sizes of the successive hierarchy levels (1..S).
      capacities: static point capacity of every level, length
        ``len(cell_sizes) + 1`` (level 0 first).  ``None`` entries inherit
        the previous level's capacity.
      out_cell_size: voxel size of the random-point output subsample, or
        ``None`` to use the raw cloud as output (classification).
      out_capacity: static capacity of the output cloud.
      frames: frame sampling config, or ``None`` for the standard
        (non-equivariant) path.
    """

    init_cell_size: float
    cell_sizes: Tuple[float, ...]
    capacities: Tuple[Optional[int], ...]
    out_cell_size: Optional[float] = None
    out_capacity: Optional[int] = None
    frames: Optional[FrameConfig] = None

    @property
    def num_levels(self) -> int:
        return len(self.cell_sizes) + 1

    @property
    def levels_radii(self) -> Tuple[float, ...]:
        """Per-level base radii = [init] + cell_sizes (reference
        ``train_dfaust_rot.py:137-139``)."""
        return (self.init_cell_size,) + tuple(self.cell_sizes)

    def resolve_capacities(self, input_capacity: int) -> Tuple[int, ...]:
        caps = []
        prev = input_capacity
        for c in self.capacities:
            prev = int(c) if c is not None else prev
            caps.append(prev)
        return tuple(caps)

    def with_capacity(self, capacity: int) -> "HierarchyConfig":
        """Rescale every static level capacity for a different scene size.

        Arbitrary-size full-scene inference (reference feeds whole scenes
        of up to ~1.5M points at batch 1, ``test_scannet_rot.py:107-134``)
        runs each scene at a capacity bucket; the per-level capacities
        scale with the input so subsampled levels don't truncate.
        """
        base = self.out_capacity or (
            self.capacities[0] if self.capacities[0] else capacity
        )
        ratio = capacity / max(int(base), 1)
        caps = tuple(
            None if c is None else max(int(-(-int(c) * ratio // 1)), 32)
            for c in self.capacities
        )
        return dataclasses.replace(
            self,
            capacities=caps,
            out_capacity=capacity if self.out_capacity else None,
        )


class Hierarchy(struct.PyTreeNode):
    """A built point hierarchy: per-level clouds + subsample maps.

    Attributes:
      levels: tuple of ``PointCloud`` (level 0 = finest). Frames attached
        when the hierarchy is equivariant.
      maps: tuple of ``SubsampleMap``; ``maps[i]`` maps level i -> i+1.
      levels_radii: static per-level base radii.
    """

    levels: Tuple[PointCloud, ...]
    maps: Tuple[SubsampleMap, ...]
    levels_radii: Tuple[float, ...] = struct.field(pytree_node=False)

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    def pool(self, level: int, values: jnp.ndarray, method: str = "avg") -> jnp.ndarray:
        """Pool per-point values from ``level`` to ``level + 1``
        (reference ``PointHierarchy.pool_tensor``)."""
        return self.maps[level].subsample(values, method)

    def upsample(self, level: int, values: jnp.ndarray) -> jnp.ndarray:
        """Broadcast values from ``level + 1`` back to ``level``
        (reference ``PointHierarchy.upsample_tensor``)."""
        return self.maps[level].upsample(values)


def attach_frames(
    key: jax.Array, pc: PointCloud, cfg: FrameConfig,
    spacing: Optional[float] = None,
) -> PointCloud:
    """Sample per-point reference frames for a cloud.

    Reference ``pc/PointcloudRotEquiv.get_local_ref_frames``
    (``pc/PointcloudRotEquiv.py:77-178``): PCA path builds a self-kNN (or
    ball-query) neighborhood, computes the 4 (free) / 2 (fixed-axis)
    candidate frames, randomly permutes them per point and keeps the first
    ``n_frames``; non-PCA path samples uniform rotations.
    """
    b, n = pc.mask.shape
    if not cfg.pca:
        frames = random_frames(key, b, n, cfg.n_frames, cfg.fixed_axis)
        return pc.with_frames(frames)

    if cfg.global_frames:
        # One PCA frame set per batch element from all valid points,
        # shared by every point (reference ``PointcloudRotEquiv.py:80-126``
        # via ``sample_global_reference_frames_pca``).
        candidates = global_pca_frames(pc.positions, pc.mask)  # [B, 4, 3, 3]
        frames = shuffle_and_select_frames(key, candidates, cfg.n_frames)
        frames = jnp.broadcast_to(
            frames[:, None], (b, n) + frames.shape[1:]
        )
        return pc.with_frames(frames)

    if cfg.neigh_method == "knn":
        # want_positions=False: carrying neighbor coordinates through the
        # search's payload sorts (the gather-free PCA path,
        # ``pca_frames_from_components``) was measured SLOWER at ScanNet
        # scale — 613 vs 487 ms for knn+PCA at 131k on chip (r3 session-E
        # sweep): three extra [M, W*cap] payload columns through two
        # variadic sorts cost more than the one M*K-row position gather
        # they save.  The components path remains available (parity
        # tested) for callers that already have ``neigh_pos``.
        neigh = knn_neighborhood(
            pc, pc, cfg.neigh_k, grid_cell_size=spacing,
        )
    elif cfg.neigh_method == "ball_query":
        neigh = ball_query_neighborhood(pc, pc, cfg.bq_radius, cfg.neigh_k)
    else:
        raise ValueError(f"unknown frame neigh_method {cfg.neigh_method!r}")

    # Fused selection: draw the same per-point permutation as
    # ``shuffle_and_select_frames`` (identical key/shape -> identical
    # choice) and let the scalarized PCA pipeline assemble only the
    # ``n_frames`` selected frames — the ``[B, N, S, 3, 3]`` candidate
    # tensor (padded 3x3 -> 8x128 tiles on TPU) never materialises.
    n_candidates = 2 if is_fixed_axis(cfg.fixed_axis) else 4
    if cfg.n_frames > n_candidates:
        raise ValueError(
            f"n_frames={cfg.n_frames} exceeds the {n_candidates} candidate "
            f"frames of this fixed_axis setting"
        )
    scores = jax.random.uniform(key, (b, n, n_candidates))
    perm = jnp.argsort(scores, axis=-1)[..., : cfg.n_frames]
    if neigh.neigh_pos is not None:
        frames = pca_frames_from_components(
            pc.positions, neigh.neigh_pos, neigh.mask,
            fixed_axis=cfg.fixed_axis, select_idx=perm,
        )  # [B, N, F, 3, 3]
    else:
        frames = pca_frames(
            pc.positions, neigh.idx, neigh.mask, fixed_axis=cfg.fixed_axis,
            select_idx=perm,
        )  # [B, N, F, 3, 3]
    return pc.with_frames(frames)


def build_hierarchy(
    key: jax.Array,
    positions: jnp.ndarray,
    mask: jnp.ndarray,
    features: Optional[jnp.ndarray],
    config: HierarchyConfig,
    labels: Optional[jnp.ndarray] = None,
):
    """Build the full hierarchy + output cloud from a raw padded batch.

    Args:
      key: PRNG key (frames + random output subsample).
      positions: ``[B, N, 3]`` raw points.
      mask: ``[B, N]`` validity.
      features: ``[B, N, C]`` raw per-point features or ``None``.
      labels: optional ``[B, N]`` int labels (segmentation).

    Returns:
      ``(hierarchy, level0_features, out_pc, out_labels, raw_to_out)``:
        * hierarchy: the built ``Hierarchy`` (frames attached per level if
          the config is equivariant),
        * level0_features: ``[B, cap0, C]`` cell-averaged features,
        * out_pc: output cloud (random-point subsample of the raw cloud with
          its own frames, or the raw cloud itself when ``out_cell_size`` is
          ``None``),
        * out_labels: labels carried to the output cloud (or ``None``),
        * raw_to_out: the ``SubsampleMap`` raw -> out (or ``None``) — needed
          by evaluators that scatter logits back to full resolution.
    """
    raw = PointCloud(positions=positions, mask=mask)
    caps = config.resolve_capacities(positions.shape[1])
    n_keys = 2 * config.num_levels + 2
    keys = jax.random.split(key, n_keys)
    k_i = 0

    # --- level 0: init subsample (cell average) --------------------------
    smap0 = build_grid_subsample(raw, config.init_cell_size, capacity=caps[0])
    level0 = PointCloud(
        positions=smap0.subsample(positions, "avg"), mask=smap0.out_mask
    )
    level0_features = (
        smap0.subsample(features, "avg") if features is not None else None
    )

    levels = []
    maps = []
    pc = level0
    if config.frames is not None:
        pc = attach_frames(
            keys[k_i], pc, config.frames,
            # a grid subsample at cell c has representative spacing ~1.3c;
            # hinting the raw cell size trips the kNN's full-coarse
            # fallback (SUBSAMPLED_SPACING_FACTOR)
            spacing=SUBSAMPLED_SPACING_FACTOR * config.init_cell_size,
        )
    k_i += 1
    levels.append(pc)

    # --- levels 1..S ------------------------------------------------------
    for i, cell in enumerate(config.cell_sizes):
        smap = build_grid_subsample(
            PointCloud(positions=pc.positions, mask=pc.mask),
            cell,
            capacity=caps[i + 1],
        )
        nxt = PointCloud(
            positions=smap.subsample(pc.positions, "avg"), mask=smap.out_mask
        )
        if config.frames is not None:
            nxt = attach_frames(
                keys[k_i], nxt, config.frames,
                spacing=SUBSAMPLED_SPACING_FACTOR * cell,
            )
        k_i += 1
        levels.append(nxt)
        maps.append(smap)
        pc = nxt

    hierarchy = Hierarchy(
        levels=tuple(levels), maps=tuple(maps), levels_radii=config.levels_radii
    )

    # --- output cloud -------------------------------------------------------
    raw_to_out = None
    if config.out_cell_size is not None:
        out_cap = config.out_capacity or positions.shape[1]
        raw_to_out = build_grid_subsample(
            raw, config.out_cell_size, rnd=True, rng=keys[k_i], capacity=out_cap
        )
        out_pc = PointCloud(
            positions=raw_to_out.subsample(positions, "avg"),
            mask=raw_to_out.out_mask,
        )
        out_labels = (
            raw_to_out.subsample(labels, "max") if labels is not None else None
        )
    else:
        out_pc = raw
        out_labels = labels
    k_i += 1

    if config.frames is not None:
        out_pc = attach_frames(
            keys[k_i], out_pc, config.frames,
            # out_cell_size=None means the RAW cloud is the output
            # (classification); its spacing is UNKNOWN — it is denser
            # than any subsampled level, so hinting a level's cell size
            # would over-size the grid cells (at-cap rows, coarse-
            # overflow recall loss).  No hint = exact brute-force kNN at
            # any size; callers with huge raw outputs should set
            # out_cell_size (ScanNet does).
            spacing=None if config.out_cell_size is None
            else SUBSAMPLED_SPACING_FACTOR * config.out_cell_size,
        )

    return hierarchy, level0_features, out_pc, out_labels, raw_to_out


def rotate_cloud(pc: PointCloud, rot: jnp.ndarray) -> PointCloud:
    """Apply a global rotation to a cloud's positions and frames.

    ``rot`` is ``[3, 3]`` (shared) or ``[B, 3, 3]`` (per example); row-vector
    points transform as ``p @ R^T``, frame columns as ``R @ F`` — the
    transformation of reference ``RotationFunctions.random_rotate``
    (``pc/RotationFunctions.py:412-425``).
    """
    if rot.ndim == 2:
        positions = pc.positions @ rot.T
        frames = (
            None
            if pc.frames is None
            else jnp.einsum("ij,bnfjk->bnfik", rot, pc.frames)
        )
    else:
        positions = jnp.einsum("bnd,bed->bne", pc.positions, rot)
        frames = (
            None
            if pc.frames is None
            else jnp.einsum("bij,bnfjk->bnfik", rot, pc.frames)
        )
    return pc.replace(positions=positions, frames=frames)


def rotate_hierarchy(h: Hierarchy, rot: jnp.ndarray) -> Hierarchy:
    """Rotate every level of a hierarchy (points + frames).

    Subsample maps are index-based and rotation-invariant, so they carry
    over unchanged.
    """
    return h.replace(levels=tuple(rotate_cloud(pc, rot) for pc in h.levels))


def random_rotate_hierarchy(key: jax.Array, h: Hierarchy):
    """Uniform random global rotation of a hierarchy; returns ``(h, rot)``
    (reference ``random_rotate``, one rotation for all levels)."""
    from .rotation import random_rotations

    rot = random_rotations(key, 1)[0]
    return rotate_hierarchy(h, rot), rot
