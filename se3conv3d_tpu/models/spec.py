"""Static model configuration + trace-time neighborhood provider.

``ModelSpec`` carries what the reference spreads over class attributes of
``models/FPNSegUNet.py:13-32`` / ``models/ClassNet.py:12-27`` and their task
subclasses (``tasks/SemSeg/seg_models.py``, ``tasks/Classification/
class_models.py``).  ``NeighborhoodProvider`` replaces the reference's
per-hierarchy neighborhood cache (``pc/PointHierarchy.py:60-79``): models
request neighborhoods by (src level, dst level, radius) during tracing and
identical requests are deduplicated, so geometry is computed once per
(level, neighborhood) per step — the same effect as the reference's cache,
but as pure trace-time sharing instead of mutable state.
"""
from __future__ import annotations

import dataclasses

import jax
from typing import Dict, Optional, Tuple

from ..core.hierarchy import Hierarchy
from ..core.neighborhoods import (
    SUBSAMPLED_SPACING_FACTOR,
    Neighborhood,
    ball_query_neighborhood,
    knn_neighborhood,
)
from ..core.pointcloud import PointCloud
from ..nn.conv import ConvFactory

__all__ = ["ModelSpec", "NeighborhoodProvider"]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static architecture hyperparameters.

    Field-for-field counterpart of the reference model class attributes;
    ``max_neighbors`` is TPU-specific: the static cap of the padded
    ball-query neighbor tables (the reference's ball query is unbounded;
    its mean normalisation makes capping benign — SURVEY §7).
    """

    conv: ConvFactory
    conv_blocks: Optional[ConvFactory] = None

    # Patch embedding (stem).
    patch_num_levels: int = 1
    patch_num_features: Tuple[int, ...] = (8,)
    patch_neigh_type: str = "ball_query"
    patch_radius_scale: float = 2.0
    patch_num_knn: int = 16

    # Encoder trunk.
    block_layer: str = "resnetformer"
    num_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2)
    num_features: Tuple[int, ...] = (64, 128, 192, 256, 320)
    neigh_type: str = "ball_query"
    # per-cell candidate bound of the grid ball query (surface occupancy
    # at radius ~ 2x spacing is ~4-9; see ball_query_neighborhood)
    bq_cell_cap: int = 16
    radius_scale: float = 2.0
    num_knn: int = 16
    radius_scale_blocks: float = 2.0
    num_knn_blocks: int = 16

    # Decoder / FPN.
    radius_scale_dec: float = 1.5
    num_knn_dec: int = 16
    fpn_dec_feats: int = 128
    num_hidden_seg_head: int = 0
    seg_head_feats: int = 128  # plain SegUNet head width (reference SegUNet.py:27)

    # Stochastic depth.
    max_path_drop: float = 0.2
    max_path_dec_drop: float = 0.0

    # Classification head (reference ``ClassNet.py:25-27``).
    pooling_method: str = "avg"
    frame_pooling_method: Optional[str] = None
    # Reference ``GLOBAL_EQUIV_FEATUREVECTOR`` (``ClassNet.py:27,131-148``):
    # skip invariant pooling and emit an equivariant per-point feature
    # vector via an all-points conv into an extra hierarchy level.
    global_equiv_featurevector: bool = False

    # TPU static neighbor caps.  Conv gather/scatter rows scale linearly
    # with the cap, and the platform is row-latency-bound; 24 truncates
    # ZERO rows across every neighborhood the seg models request on
    # surface workloads — all their convs run on grid-subsampled levels,
    # where radius/spacing is fixed by radius_scale (measured occupancy
    # means 8-16, p(>=24) = 0.000, experiments/chip_bq_occupancy.py) —
    # while cutting the 131k ScanNet train step 2.97 -> 2.57 s.  Capped
    # rows keep the NEAREST k (cap_mode default), so denser data degrades
    # gracefully.  Class presets override back to 32: their patch stem
    # ball-queries the RAW (unsubsampled, denser) cloud, which the
    # occupancy measurement does not cover.
    max_neighbors: int = 24

    # Precompute rot-equivariant edge geometry once per neighborhood (the
    # reference's rot-tensor cache).  Trades HBM for recompute: measured
    # +13% step speed on DFaust at batch 16; the cached tensors scale with
    # F_out x F_in, so at the largest batch x frame-count combinations it
    # can exceed memory — disable (or use gradient accumulation) there.
    cache_equiv_geometry: bool = True

    def __post_init__(self):
        if self.conv_blocks is None:
            object.__setattr__(self, "conv_blocks", self.conv)
        if len(self.patch_num_features) != self.patch_num_levels:
            raise ValueError("patch_num_features must have patch_num_levels entries")
        if len(self.num_blocks) != len(self.num_features):
            raise ValueError("num_blocks and num_features must align")

    @property
    def num_levels(self) -> int:
        """Hierarchy levels the model expects (patch levels + trunk levels)."""
        return self.patch_num_levels + len(self.num_features)

    @property
    def equivariant(self) -> bool:
        return self.conv.equivariant


class NeighborhoodProvider:
    """Trace-time neighborhood cache over a hierarchy.

    ``get(src, dst, radius, neigh_type, k)`` returns the padded neighbor
    table from hierarchy level ``src`` to level ``dst``; repeated identical
    requests during one trace return the same traced value (XLA CSE would
    catch most of it anyway, but this also keeps the program small).
    """

    def __init__(
        self, hierarchy: Hierarchy, spec: ModelSpec,
        collect_trunc: bool = False,
    ):
        self.hierarchy = hierarchy
        self.spec = spec
        # During the calibration pass, ball queries also certify their
        # static cap: ``Neighborhood.trunc`` marks rows where more than
        # ``max_neighbors`` sources lay in the ball (the reference's ball
        # query is unbounded, ``store_neighbors.cu:129-176``, so
        # truncation is a silent semantic deviation worth a warning).
        self.collect_trunc = collect_trunc
        self._cache: Dict[tuple, Neighborhood] = {}

    def _build(
        self,
        src_pc: PointCloud,
        dst_pc: PointCloud,
        radius: float,
        neigh_type: str,
        k: int,
        spacing: Optional[float] = None,
        multi_use: bool = True,
    ) -> Neighborhood:
        if neigh_type == "ball_query":
            neigh = ball_query_neighborhood(
                src_pc, dst_pc, radius, self.spec.max_neighbors,
                cell_cap=self.spec.bq_cell_cap,
                want_trunc=self.collect_trunc,
            )
        elif neigh_type == "knn":
            # ``spacing`` is the source level's subsample cell size; its
            # clouds' true representative spacing is ~1.3x that
            # (core.neighborhoods.SUBSAMPLED_SPACING_FACTOR — raw cell
            # hints trip the kNN's full-coarse fallback).
            neigh = knn_neighborhood(
                src_pc, dst_pc, k,
                grid_cell_size=None if spacing is None
                else SUBSAMPLED_SPACING_FACTOR * spacing,
            )
        else:
            raise ValueError(f"unknown neighborhood type {neigh_type!r}")
        return self._attach_equiv_geometry(neigh, src_pc, dst_pc, multi_use)

    def _attach_equiv_geometry(
        self, neigh: Neighborhood, src_pc: PointCloud, dst_pc: PointCloud,
        multi_use: bool = True,
    ) -> Neighborhood:
        """Precompute the rot-equivariant edge geometry once per
        neighborhood (the reference's rot-tensor cache,
        ``PNEConvLayerRotEquiv.py:53-71``) so every conv layer on this
        neighborhood shares it instead of recomputing it — including in
        rematerialized backward passes."""
        if (
            not self.spec.equivariant
            or not self.spec.cache_equiv_geometry
            or src_pc.frames is None
            or dst_pc.frames is None
        ):
            return neigh
        from ..ops import pne_conv as _ops
        from ..nn.conv import fused_dispatch

        def _fused(fac):
            return fused_dispatch(
                fac.pne_type, fac.aggregation, fac.equivariant,
                fac.rel_rot_type, fac.use_fused,
            )

        # Which factories consume this neighborhood?  Self (multi_use)
        # neighborhoods feed the level's block stack (``conv_blocks``)
        # AND, at the first trunk level, the patch stem's self conv
        # (``conv`` — same cache key when patch_radius_scale ==
        # radius_scale_blocks); cross-level neighborhoods feed ``conv``
        # convs only.  The payload must serve every consumer: a mismatch
        # (wrong dtype, or missing rel/rot for a non-fused conv) makes
        # that conv silently rebuild its geometry every call, including
        # in rematerialized backwards.
        facs = (
            [self.spec.conv_blocks, self.spec.conv]
            if multi_use else [self.spec.conv]
        )
        fused_facs = [fc for fc in facs if _fused(fc)]
        plain_facs = [fc for fc in facs if not _fused(fc)]
        if fused_facs:
            if not multi_use:
                # single-conv neighborhood (decoder / FPN / seg-head /
                # down convs): the fused conv fuses the geometry build
                # into its feature gather (_gather_geo_feats — one
                # latency-bound row-gather pass instead of two), which
                # beats a pre-built cache consumed once.
                return neigh
            # the fused path's cache payload: packed transposed geometry.
            # The dtype follows the leading consumer (conv_blocks — the
            # block stack dominates); only an actual bf16 request selects
            # the bf16 (hi/lo split) cache table — an explicit float32
            # compute_dtype must match the uncached f32 geometry exactly,
            # and a consumer requesting the OTHER dtype rebuilds locally
            # (dtype guard in fused_equiv_conv).
            lead = fused_facs[0]
            geo_dt = (
                "bfloat16"
                if lead.compute_dtype
                and jax.numpy.dtype(lead.compute_dtype) == jax.numpy.bfloat16
                else None
            )
            geo_t = _ops.packed_equiv_geometry(
                src_pc, dst_pc, neigh, geo_dt, lead.rel_rot_type
            )
            neigh = neigh.replace(equiv_geo_t=geo_t)
            if _ops.BWD_SCATTER_MODE == "sorted":
                # sorted-edge tables shared by every layer's backward
                neigh = _ops.backward_sort_tables(
                    neigh, src_pc.positions.shape[1]
                )
        if plain_facs:
            # XLA-path consumers read equiv_rel / equiv_rot.
            rel, rot = _ops.equiv_geometry_parts(
                src_pc, dst_pc, neigh, plain_facs[0].rel_rot_type
            )
            neigh = neigh.replace(equiv_rel=rel, equiv_rot=rot)
        return neigh

    def get(
        self, src: int, dst: int, radius: float, neigh_type: str, k: int
    ) -> Neighborhood:
        key = (src, dst, round(float(radius), 9), neigh_type, k)
        if key not in self._cache:
            self._cache[key] = self._build(
                self.hierarchy.levels[src],
                self.hierarchy.levels[dst],
                radius,
                neigh_type,
                k,
                spacing=self.hierarchy.levels_radii[src],
                # self-neighborhoods feed a level's whole block stack;
                # cross-level neighborhoods feed exactly one conv
                multi_use=src == dst,
            )
        return self._cache[key]

    def to_cloud(
        self, src: int, dst_pc: PointCloud, radius: float, neigh_type: str, k: int
    ) -> Neighborhood:
        """Neighborhood from a hierarchy level to an external cloud (the
        segmentation output cloud — reference ``FPNSegUNet.py:147-177``)."""
        return self._build(
            self.hierarchy.levels[src], dst_pc, radius, neigh_type, k,
            spacing=self.hierarchy.levels_radii[src],
            multi_use=False,  # the seg head is one conv
        )
