"""Residual blocks, skip connections and stochastic depth (flax).

Counterparts of reference ``layers/DropPathPC.py``, ``SkipConnection.py``,
``Block.py``, ``ResNetB.py``, ``ResConvNeXt.py``, ``ResNetFormer.py``.
Linear layers use torch-style uniform fan-in init for parity with the
reference's ``torch.nn.Linear`` defaults.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.neighborhoods import Neighborhood
from ..core.pointcloud import PointCloud
from .conv import ConvFactory
from .norm import MaskedBatchNorm

__all__ = ["TorchLinear", "DropPath", "SkipConnection", "ResNetFormer", "ResNetB", "ResConvNeXt"]


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear default init (uniform +-1/sqrt(fan_in))."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (fan_in, self.features),
        )
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,),
        )
        return x @ kernel + bias


class DropPath(nn.Module):
    """Per-batch-element stochastic depth (reference ``DropPathPC.py:5-50``).

    The whole residual branch of a batch element is dropped together -
    frames and points of one example share the coin flip (the reference
    indexes the per-example mask by ``batch_ids_considering_frames_``).
    """

    drop_prob: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.drop_prob == 0.0 or not train:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("droppath")
        b = x.shape[0]
        mask = jnp.floor(
            keep + jax.random.uniform(rng, (b,) + (1,) * (x.ndim - 1), x.dtype)
        )
        return x / keep * mask


class SkipConnection(nn.Module):
    """``drop_path(x * gamma) + y`` with learnable per-channel gamma
    (reference ``SkipConnection.py:7-43``, init 1e-6)."""

    features: int
    drop_prob: float
    init_gamma: float = 1e-6

    @nn.compact
    def __call__(self, x, y, train: bool):
        # Explicit dtype: a weak-typed init would retrace the train step
        # after the first optimizer update.
        gamma = self.param(
            "gamma",
            lambda k, s: jnp.full(s, self.init_gamma, jnp.float32),
            (1, self.features),
        )
        return DropPath(self.drop_prob)(x * gamma, train) + y


class ResNetFormer(nn.Module):
    """Pre-norm conv residual + pre-norm MLP residual
    (reference ``ResNetFormer.py:5-91``) - the block used by every shipped
    model (``models/FPNSegUNet.py:20``)."""

    in_features: int
    out_features: int
    conv_factory: ConvFactory
    drop_prob: float = 0.0

    @nn.compact
    def __call__(
        self,
        pc: PointCloud,
        features: jnp.ndarray,
        neigh: Neighborhood,
        train: bool,
        calibrate: bool = False,
    ):
        x = MaskedBatchNorm(self.in_features, name="norm_1")(features, pc.mask, train)
        x = self.conv_factory.make(self.in_features, self.in_features, name="spatial_conv")(
            pc, pc, x, neigh, calibrate
        )
        x = SkipConnection(self.in_features, self.drop_prob, name="skip_path_1")(
            x, features, train
        )

        y = MaskedBatchNorm(self.in_features, name="norm_2")(x, pc.mask, train)
        y = TorchLinear(self.in_features * 2, name="linear_1")(y)
        y = jax.nn.gelu(y)
        y = TorchLinear(self.out_features, name="linear_2")(y)

        if self.in_features != self.out_features:
            skip = TorchLinear(self.out_features, name="skip_conv")(x)
        else:
            skip = x
        return SkipConnection(self.out_features, self.drop_prob, name="skip_path_2")(
            y, skip, train
        )


class ResNetB(nn.Module):
    """Bottleneck residual block (reference ``ResNetB.py:5-84``):
    norm -> linear (C/2) -> conv -> GELU -> linear (C_out) -> skip."""

    in_features: int
    out_features: int
    conv_factory: ConvFactory
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, pc, features, neigh, train: bool, calibrate: bool = False):
        hidden = self.in_features // 2
        x = MaskedBatchNorm(self.in_features, name="norm")(features, pc.mask, train)
        x = TorchLinear(hidden, name="linear_1")(x)
        x = self.conv_factory.make(hidden, hidden, name="spatial_conv")(
            pc, pc, x, neigh, calibrate
        )
        x = jax.nn.gelu(x)
        x = TorchLinear(self.out_features, name="linear_2")(x)
        if self.in_features != self.out_features:
            skip = TorchLinear(self.out_features, name="skip_conv")(features)
        else:
            skip = features
        return SkipConnection(self.out_features, self.drop_prob, name="skip_path")(
            x, skip, train
        )


class ResConvNeXt(nn.Module):
    """ConvNeXt-style block (reference ``ResConvNeXt.py:5-83``):
    conv -> norm -> linear (2C) -> GELU -> linear (C_out) -> skip."""

    in_features: int
    out_features: int
    conv_factory: ConvFactory
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, pc, features, neigh, train: bool, calibrate: bool = False):
        x = self.conv_factory.make(self.in_features, self.in_features, name="spatial_conv")(
            pc, pc, features, neigh, calibrate
        )
        x = MaskedBatchNorm(self.in_features, name="norm")(x, pc.mask, train)
        x = TorchLinear(self.in_features * 2, name="linear_1")(x)
        x = jax.nn.gelu(x)
        x = TorchLinear(self.out_features, name="linear_2")(x)
        if self.in_features != self.out_features:
            skip = TorchLinear(self.out_features, name="skip_conv")(features)
        else:
            skip = features
        return SkipConnection(self.out_features, self.drop_prob, name="skip_path")(
            x, skip, train
        )
