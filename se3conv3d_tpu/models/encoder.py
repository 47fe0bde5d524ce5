"""Patch encoder + encoder trunk (flax).

Counterparts of reference ``models/PatchEncoder.py:5-113`` and
``models/Encoder.py:7-173``.  Hierarchy levels are indexed exactly like the
reference: patch levels 0..P, trunk levels P..P+L-1 where L =
``len(num_features)``.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.hierarchy import Hierarchy
from ..nn.blocks import ResConvNeXt, ResNetB, ResNetFormer, TorchLinear
from ..nn.norm import MaskedBatchNorm
from .spec import ModelSpec, NeighborhoodProvider

__all__ = ["PatchEncoder", "Encoder", "BLOCK_LAYERS"]

BLOCK_LAYERS = {
    "resnetformer": ResNetFormer,
    "resnetb": ResNetB,
    "resconvnext": ResConvNeXt,
}


class PatchEncoder(nn.Module):
    """Stem: per patch level, conv (lvl -> lvl+1) + conv (lvl+1 -> lvl+1),
    each followed by BN + GELU, then a final linear + BN
    (reference ``models/PatchEncoder.py:65-113``)."""

    spec: ModelSpec
    num_in_feats: int

    @nn.compact
    def __call__(
        self,
        hierarchy: Hierarchy,
        features: jnp.ndarray,
        provider: NeighborhoodProvider,
        train: bool,
        calibrate: bool = False,
    ) -> jnp.ndarray:
        s = self.spec
        radii = hierarchy.levels_radii
        x = features
        for lvl in range(s.patch_num_levels):
            feats = s.patch_num_features[lvl]
            in_feats = self.num_in_feats if lvl == 0 else s.patch_num_features[lvl - 1]

            neigh_down = provider.get(
                lvl, lvl + 1, s.patch_radius_scale * radii[lvl],
                s.patch_neigh_type, s.patch_num_knn,
            )
            x = s.conv.make(in_feats, feats, name=f"conv_{2 * lvl}")(
                hierarchy.levels[lvl], hierarchy.levels[lvl + 1], x,
                neigh_down, calibrate,
            )
            x = MaskedBatchNorm(feats, name=f"norm_{2 * lvl}")(
                x, hierarchy.levels[lvl + 1].mask, train
            )
            x = jax.nn.gelu(x)

            neigh_same = provider.get(
                lvl + 1, lvl + 1, s.patch_radius_scale * radii[lvl + 1],
                s.patch_neigh_type, s.patch_num_knn,
            )
            x = s.conv.make(feats, feats, name=f"conv_{2 * lvl + 1}")(
                hierarchy.levels[lvl + 1], hierarchy.levels[lvl + 1], x,
                neigh_same, calibrate,
            )
            x = MaskedBatchNorm(feats, name=f"norm_{2 * lvl + 1}")(
                x, hierarchy.levels[lvl + 1].mask, train
            )
            x = jax.nn.gelu(x)

        x = TorchLinear(s.num_features[0], name="linear")(x)
        x = MaskedBatchNorm(s.num_features[0], name="norm_out")(
            x, hierarchy.levels[s.patch_num_levels].mask, train
        )
        return x


class Encoder(nn.Module):
    """Patch stem + per-level residual-block stacks with down-convs between
    levels (reference ``models/Encoder.py:116-173``).

    Returns the per-level feature list (finest trunk level first).
    """

    spec: ModelSpec
    num_in_feats: int

    @nn.compact
    def __call__(
        self,
        hierarchy: Hierarchy,
        features: jnp.ndarray,
        provider: NeighborhoodProvider,
        train: bool,
        calibrate: bool = False,
    ) -> List[jnp.ndarray]:
        s = self.spec
        radii = hierarchy.levels_radii
        p = s.patch_num_levels
        num_levels = len(s.num_features)
        block_cls = BLOCK_LAYERS[s.block_layer]

        # The patch encoder applies even with 0 patch levels: its final
        # linear + BN lift the raw input features to num_features[0]
        # (reference ``PatchEncoder.py:108-113`` — the level loop is empty
        # but LINEAR_/BN_ still run; ScanNet uses PATCH_NUM_LEVELS = 0).
        x = PatchEncoder(s, self.num_in_feats, name="patch_encoder")(
            hierarchy, features, provider, train, calibrate
        )

        # Stochastic-depth schedule: linspace 0 -> max over all blocks
        # (reference ``Encoder.py:92-105``).
        drop_paths = np.linspace(0.0, s.max_path_drop, int(np.sum(s.num_blocks)))

        out_feats = []
        block_id = 0
        for lvl in range(num_levels):
            h_lvl = lvl + p
            pc = hierarchy.levels[h_lvl]
            neigh_block = provider.get(
                h_lvl, h_lvl, s.radius_scale_blocks * radii[h_lvl],
                s.neigh_type, s.num_knn_blocks,
            )
            for i in range(s.num_blocks[lvl]):
                x = block_cls(
                    in_features=s.num_features[lvl],
                    out_features=s.num_features[lvl],
                    conv_factory=s.conv_blocks,
                    drop_prob=float(drop_paths[block_id]),
                    name=f"block_{lvl}_{i}",
                )(pc, x, neigh_block, train, calibrate)
                block_id += 1
            out_feats.append(x)

            if lvl < num_levels - 1:
                x = MaskedBatchNorm(s.num_features[lvl], name=f"down_norm_{lvl}")(
                    x, pc.mask, train
                )
                neigh_down = provider.get(
                    h_lvl, h_lvl + 1, s.radius_scale * radii[h_lvl],
                    s.neigh_type, s.num_knn,
                )
                x = s.conv.make(
                    s.num_features[lvl], s.num_features[lvl + 1],
                    name=f"down_conv_{lvl}",
                )(pc, hierarchy.levels[h_lvl + 1], x, neigh_down, calibrate)

        return out_feats
