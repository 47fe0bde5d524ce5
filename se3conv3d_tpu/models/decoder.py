"""Decoder, PatchDecoder and FPNDecoder (flax).

Counterparts of reference ``models/Decoder.py:5-100``,
``models/PatchDecoder.py:5-84`` and ``models/FPNDecoder.py:8-137``.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.hierarchy import Hierarchy
from ..nn.blocks import SkipConnection, TorchLinear
from ..nn.norm import MaskedBatchNorm
from .spec import ModelSpec, NeighborhoodProvider

__all__ = ["Decoder", "PatchDecoder", "FPNDecoder"]


class Decoder(nn.Module):
    """Top-down pathway: per level norm -> conv (level -> level-1) ->
    SkipConnection with the encoder's skip features; returns the feature
    list deepest first (reference ``models/Decoder.py:70-100``)."""

    spec: ModelSpec

    @nn.compact
    def __call__(
        self,
        hierarchy: Hierarchy,
        enc_feats: List[jnp.ndarray],
        provider: NeighborhoodProvider,
        train: bool,
        calibrate: bool = False,
    ) -> List[jnp.ndarray]:
        s = self.spec
        radii = hierarchy.levels_radii
        feats = s.num_features
        n_steps = len(feats) - 1
        last_level = hierarchy.num_levels - 1

        # Reference ``Decoder.py:43``: linspace(max, 0, L-1) indexed by the
        # trunk level being decoded *to*; deepest step gets ~0.
        drop_paths = np.linspace(s.max_path_dec_drop, 0.0, max(n_steps, 1))

        enc_rev = list(reversed(enc_feats))
        x = enc_rev[0]
        out = [x]
        for it in range(n_steps):
            cur_level = last_level - it
            lvl_feats = feats[n_steps - it]        # features at cur_level
            dst_feats = feats[n_steps - it - 1]    # features at cur_level-1

            x = MaskedBatchNorm(lvl_feats, name=f"norm_{it}")(
                x, hierarchy.levels[cur_level].mask, train
            )
            neigh = provider.get(
                cur_level, cur_level - 1, s.radius_scale_dec * radii[cur_level],
                s.neigh_type, s.num_knn_dec,
            )
            x = s.conv.make(lvl_feats, dst_feats, name=f"conv_{it}")(
                hierarchy.levels[cur_level], hierarchy.levels[cur_level - 1],
                x, neigh, calibrate,
            )
            x = SkipConnection(
                dst_feats, float(drop_paths[n_steps - 1 - it]), name=f"skip_{it}"
            )(x, enc_rev[it + 1], train)
            out.append(x)
        return out


class PatchDecoder(nn.Module):
    """Mirror of the patch stem: per patch level conv (lvl+1 -> lvl) +
    BN + GELU (reference ``models/PatchDecoder.py:62-84``)."""

    spec: ModelSpec

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
        for lvl in reversed(range(s.patch_num_levels)):
            neigh = provider.get(
                lvl + 1, lvl, s.radius_scale_dec * radii[lvl + 1],
                s.neigh_type, s.num_knn_dec,
            )
            x = s.conv.make(s.fpn_dec_feats, s.fpn_dec_feats, name=f"conv_{lvl}")(
                hierarchy.levels[lvl + 1], hierarchy.levels[lvl], x,
                neigh, calibrate,
            )
            x = MaskedBatchNorm(s.fpn_dec_feats, name=f"norm_{lvl}")(
                x, hierarchy.levels[lvl].mask, train
            )
            x = jax.nn.gelu(x)
        return x


class FPNDecoder(nn.Module):
    """Decoder + FPN lateral sums + patch upsample
    (reference ``models/FPNDecoder.py:87-137``)."""

    spec: ModelSpec

    @nn.compact
    def __call__(
        self,
        hierarchy: Hierarchy,
        enc_feats: List[jnp.ndarray],
        provider: NeighborhoodProvider,
        train: bool,
        calibrate: bool = False,
    ) -> jnp.ndarray:
        s = self.spec
        radii = hierarchy.levels_radii
        dec_feats = Decoder(s, name="decoder")(
            hierarchy, enc_feats, provider, train, calibrate
        )

        last_level = hierarchy.num_levels - 1
        dest_level = last_level - len(enc_feats) + 1  # == patch_num_levels
        n_lateral = len(s.num_features) - 1

        # Finest decoder output goes straight through a linear + BN.
        x = TorchLinear(s.fpn_dec_feats, name="linear_out")(dec_feats[-1])
        x = MaskedBatchNorm(s.fpn_dec_feats, name="norm_out")(
            x, hierarchy.levels[dest_level].mask, train
        )

        # Lateral paths: deeper decoder levels norm -> linear -> conv to the
        # destination level -> norm, summed.
        rev_feats = list(reversed(s.num_features[1:]))
        for it in range(n_lateral):
            cur_level = last_level - it
            cur = MaskedBatchNorm(rev_feats[it], name=f"norm_a_{it}")(
                dec_feats[it], hierarchy.levels[cur_level].mask, train
            )
            cur = TorchLinear(s.fpn_dec_feats, name=f"linear_{it}")(cur)
            neigh = provider.get(
                cur_level, dest_level, s.radius_scale_dec * radii[cur_level],
                s.neigh_type, s.num_knn_dec,
            )
            cur = s.conv.make(s.fpn_dec_feats, s.fpn_dec_feats, name=f"conv_{it}")(
                hierarchy.levels[cur_level], hierarchy.levels[dest_level],
                cur, neigh, calibrate,
            )
            cur = MaskedBatchNorm(s.fpn_dec_feats, name=f"norm_b_{it}")(
                cur, hierarchy.levels[dest_level].mask, train
            )
            x = x + cur

        if s.patch_num_levels > 0:
            x = PatchDecoder(s, name="patch_decoder")(
                hierarchy, x, provider, train, calibrate
            )
        return x
