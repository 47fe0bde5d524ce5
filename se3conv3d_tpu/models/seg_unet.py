"""Segmentation U-Nets (flax).

``FPNSegUNet``: counterpart of reference ``models/FPNSegUNet.py:9-223``
plus the frame-pooling forward of the rot-equivariant task subclasses
(``tasks/SemSeg/seg_models.py:90-101``).  ``SegUNet``: the plain (non-FPN)
variant of reference ``models/SegUNet.py:9-145``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.hierarchy import Hierarchy
from ..core.pointcloud import PointCloud, frame_pool
from ..nn.blocks import TorchLinear
from ..nn.norm import MaskedBatchNorm
from .decoder import Decoder, FPNDecoder
from .encoder import Encoder
from .spec import ModelSpec, NeighborhoodProvider

__all__ = ["FPNSegUNet", "SegUNet"]


class FPNSegUNet(nn.Module):
    """Encoder + FPN decoder + segmentation head.

    Call:
      ``model(hierarchy, features, out_pc, train=..., calibrate=...)``

      * features: ``[B, N0, C]`` (standard) or ``[B, N0, F, C]``
        (equivariant) at hierarchy level 0.
      * out_pc: the output cloud (with frames in the equivariant case).

    Returns per-output-point logits ``[B, M, num_classes]``; in the
    equivariant case logits are frame-averaged to invariance
    (reference ``seg_models.py:97-101``).
    """

    spec: ModelSpec
    num_in_feats: int
    num_classes: int
    frame_pooling: str = "avg"

    @nn.compact
    def __call__(
        self,
        hierarchy: Hierarchy,
        features: jnp.ndarray,
        out_pc: PointCloud,
        train: bool,
        calibrate: bool = False,
        return_hidden: bool = False,
    ):
        s = self.spec
        provider = NeighborhoodProvider(hierarchy, s, collect_trunc=calibrate)

        enc = Encoder(s, self.num_in_feats, name="encoder")(
            hierarchy, features, provider, train, calibrate
        )
        x = FPNDecoder(s, name="fpn_decoder")(
            hierarchy, enc, provider, train, calibrate
        )

        # Segmentation head: fresh neighborhood level 0 -> output cloud
        # (reference ``FPNSegUNet.process_last_upsample``, ``:147-195``).
        neigh_out = provider.to_cloud(
            0, out_pc, s.radius_scale * hierarchy.levels_radii[0],
            s.neigh_type, s.num_knn,
        )
        hidden = s.conv.make(s.fpn_dec_feats, s.fpn_dec_feats, name="seg_conv")(
            hierarchy.levels[0], out_pc, x, neigh_out, calibrate
        )
        x = hidden
        for i in range(s.num_hidden_seg_head):
            x = MaskedBatchNorm(s.fpn_dec_feats, name=f"seg_hidden_norm_{i}")(
                x, out_pc.mask, train
            )
            x = jax.nn.gelu(x)
            x = TorchLinear(s.fpn_dec_feats, name=f"seg_hidden_linear_{i}")(x)
        x = MaskedBatchNorm(s.fpn_dec_feats, name="seg_norm")(x, out_pc.mask, train)
        x = jax.nn.gelu(x)
        x = TorchLinear(self.num_classes, name="seg_linear")(x)

        if s.equivariant:
            x = frame_pool(x, self.frame_pooling)

        if return_hidden:
            return x, hidden
        return x


class SegUNet(nn.Module):
    """Plain (non-FPN) segmentation U-Net.

    Reference ``models/SegUNet.py:9-145``: Encoder + top-down Decoder, then
    head = BN -> conv (finest trunk level -> output cloud) -> BN -> GELU ->
    linear.  The encoder's block convs share the main factory and radii
    (``SegUNet.py:59-70``).
    """

    spec: ModelSpec
    num_in_feats: int
    num_classes: int
    frame_pooling: str = "avg"

    @nn.compact
    def __call__(
        self,
        hierarchy: Hierarchy,
        features: jnp.ndarray,
        out_pc: PointCloud,
        train: bool,
        calibrate: bool = False,
    ):
        s = self.spec
        provider = NeighborhoodProvider(hierarchy, s, collect_trunc=calibrate)

        enc = Encoder(s, self.num_in_feats, name="encoder")(
            hierarchy, features, provider, train, calibrate
        )
        dec = Decoder(s, name="decoder")(
            hierarchy, enc, provider, train, calibrate
        )
        x = dec[-1]  # finest trunk level (= patch_num_levels)

        p = s.patch_num_levels
        x = MaskedBatchNorm(s.num_features[0], name="seg_norm_1")(
            x, hierarchy.levels[p].mask, train
        )
        neigh_out = provider.to_cloud(
            p, out_pc, s.radius_scale * hierarchy.levels_radii[p],
            s.neigh_type, s.num_knn,
        )
        x = s.conv.make(s.num_features[0], s.seg_head_feats, name="seg_conv")(
            hierarchy.levels[p], out_pc, x, neigh_out, calibrate
        )
        x = MaskedBatchNorm(s.seg_head_feats, name="seg_norm_2")(
            x, out_pc.mask, train
        )
        x = jax.nn.gelu(x)
        x = TorchLinear(self.num_classes, name="seg_linear")(x)

        if s.equivariant:
            x = frame_pool(x, self.frame_pooling)
        return x
