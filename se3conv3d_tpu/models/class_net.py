"""Classification network (flax).

Counterpart of reference ``models/ClassNet.py:8-153``, including the
``GLOBAL_EQUIV_FEATUREVECTOR`` all-points-conv path
(``ModelSpec.global_equiv_featurevector``, reference ``:131-148``) and the
invariant frame/batch pooling variants.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..core.hierarchy import Hierarchy
from ..core.pointcloud import frame_pool, global_pool
from ..nn.blocks import TorchLinear
from ..nn.norm import MaskedBatchNorm
from .encoder import Encoder
from .spec import ModelSpec, NeighborhoodProvider

__all__ = ["ClassNet"]


class ClassNet(nn.Module):
    """Encoder + global pooling + BN + linear head.

    Equivariant path (reference ``ClassNet.py:114-129``): if
    ``spec.frame_pooling_method`` is set, frames are pooled to invariant
    per-point features first, then points are pooled by
    ``spec.pooling_method``; otherwise points x frames pool jointly.
    """

    spec: ModelSpec
    num_in_feats: int
    num_classes: int

    @nn.compact
    def __call__(
        self,
        hierarchy: Hierarchy,
        features: jnp.ndarray,
        train: bool,
        calibrate: bool = False,
    ) -> jnp.ndarray:
        s = self.spec
        provider = NeighborhoodProvider(hierarchy, s, collect_trunc=calibrate)
        enc = Encoder(s, self.num_in_feats, name="encoder")(
            hierarchy, features, provider, train, calibrate
        )
        feats = enc[-1]

        if s.global_equiv_featurevector:
            # Equivariant global feature path (reference
            # ``ClassNet.py:131-148``): norm at the last trunk level, then a
            # conv into one extra hierarchy level using every point as a
            # neighbor (kNN with k = level capacity), then BN + linear.
            # Requires the hierarchy to carry that extra level.
            c = s.num_features[-1]
            trunk_level = hierarchy.num_levels - 2
            x = MaskedBatchNorm(c, name="almost_last_norm")(
                feats, hierarchy.levels[trunk_level].mask, train
            )
            neigh = provider.get(
                trunk_level, trunk_level + 1, 0.0, "knn",
                hierarchy.levels[trunk_level].capacity,
            )
            x = s.conv.make(c, 2 * c, name="global_conv_down")(
                hierarchy.levels[trunk_level], hierarchy.levels[trunk_level + 1],
                x, neigh, calibrate,
            )
            x = MaskedBatchNorm(2 * c, name="last_norm")(
                x, hierarchy.levels[trunk_level + 1].mask, train
            )
            return TorchLinear(2 * c, name="last_linear")(x)

        last_pc = hierarchy.levels[-1]
        if feats.ndim == 4 and s.frame_pooling_method is not None:
            feats = frame_pool(feats, s.frame_pooling_method)
        x = global_pool(last_pc, feats, s.pooling_method)  # [B, C]

        # Plain BatchNorm1d over the pooled vectors (reference
        # ``ClassNet.py:72``): each batch element is one row.
        b = x.shape[0]
        x = MaskedBatchNorm(s.num_features[-1], name="class_norm")(
            x[:, None, :], jnp.ones((b, 1), bool), train
        )[:, 0]
        return TorchLinear(self.num_classes, name="class_head")(x)
