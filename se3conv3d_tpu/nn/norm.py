"""Mask-aware normalisation layers.

The reference's ``BatchNormPC`` (``layers/BatchNormPC.py:7-32``) is a plain
``torch.nn.BatchNorm1d(momentum=0.2)`` over the flat point rows; in the
padded layout batch statistics must exclude padding, so this is a masked
batch norm with torch-compatible semantics:

  * normalisation uses the biased batch variance,
  * the running variance is updated with the *unbiased* variance,
  * ``running = (1 - momentum) * running + momentum * batch``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MaskedBatchNorm", "MaskedGroupNorm"]


def _row_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a ``[B, N]`` point mask over extra row axes of x ([B,N,...,C])."""
    extra = x.ndim - mask.ndim - 1
    return mask.reshape(mask.shape + (1,) * extra)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid point rows (frames count as rows, like the
    reference's flat ``(n*F, C)`` layout).

    Call with ``x: [B, N, C]`` or ``[B, N, F, C]`` and ``mask: [B, N]``.
    """

    features: int
    momentum: float = 0.2
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )

        if train:
            m = _row_mask(x, mask).astype(x.dtype)[..., None]
            count = jnp.maximum(jnp.sum(m) * 1.0, 1.0)
            mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / count
            var = (
                jnp.sum(m * (x - mean) ** 2, axis=tuple(range(x.ndim - 1))) / count
            )
            if not self.is_initializing():
                unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class MaskedGroupNorm(nn.Module):
    """Per-batch-element group norm over valid rows.

    Reference ``layers/GroupNormPC.py:9-57`` (normalises each batch element's
    points separately via scatter means).  The reference version has a
    latent attribute bug and is unused by shipped models; this one is
    functional.
    """

    features: int
    num_groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool = True):
        del train
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        g = self.num_groups
        orig_shape = x.shape
        xg = x.reshape(orig_shape[:-1] + (g, self.features // g))
        m = _row_mask(x, mask).astype(x.dtype)[..., None, None]
        # reduce over all row axes + channel-in-group axis, per batch element
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        count = jnp.maximum(jnp.sum(m, axis=axes, keepdims=True) * (self.features // g), 1.0)
        mean = jnp.sum(xg * m, axis=axes, keepdims=True) / count
        var = jnp.sum(m * (xg - mean) ** 2, axis=axes, keepdims=True) / count
        y = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        return y.reshape(orig_shape) * scale + bias
