"""Attention-based point conv layers (flax).

Counterparts of reference ``layers/LoRAttConvLayer.py:11-215`` and
``layers/MultiHeadAttLayer.py:11-202``: a gaussian kernel-point embedding
aggregates q/v features into the num_basis slots (CUDA ``feat_basis_proj``
in the reference; a padded einsum here), multi-head attention runs over the
basis slots with a learned positional embedding, and LoRAtt adds a parallel
basis-weighted convolution term.  Same-cloud only (the reference asserts
``p_pc_in == p_pc_out``).  Not used by any shipped task config, kept for
API parity.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.neighborhoods import Neighborhood
from ..core.pointcloud import PointCloud
from ..ops import pne_conv as ops
from .blocks import TorchLinear
from .conv import _uniform_init
from .icosphere import icosphere_points


def _rotated_kernel_points(seed: int, kp_res: str):
    """Kernel points with the reference's random Euler rotation fixed at
    construction (``LoRAttConvLayer.py:46-75``; there a numpy draw stored
    as a buffer — here a deterministic draw from ``kp_seed``)."""
    if kp_res == "double":
        sigma = 0.16
        kp = np.concatenate(
            [icosphere_points(0) * 0.35, icosphere_points(1) * 0.7,
             np.zeros((1, 3))]
        ).astype(np.float32)
    else:
        sigma = 0.3
        kp = (
            np.concatenate([icosphere_points(0), np.zeros((1, 3))]) * 0.6
        ).astype(np.float32)
    ang = np.random.RandomState(seed).uniform(size=(3,)) * 2.0 * np.pi
    cx, sx = np.cos(ang[0]), np.sin(ang[0])
    cy, sy = np.cos(ang[1]), np.sin(ang[1])
    cz, sz = np.cos(ang[2]), np.sin(ang[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (kp @ (rx @ ry @ rz)).astype(np.float32), sigma


class _AttBase(nn.Module):
    in_features: int
    out_features: int
    num_basis: int = 16
    kp_res: str = "single"
    num_heads: int = 4
    kp_seed: int = 0
    with_conv_term: bool = False  # LoRAtt adds the standard conv path

    @nn.compact
    def __call__(
        self,
        pc_in: PointCloud,
        pc_out: PointCloud,
        features: jnp.ndarray,
        neigh: Neighborhood,
        calibrate: bool = False,
    ) -> jnp.ndarray:
        v_size = self.in_features
        kp_np, sigma = _rotated_kernel_points(self.kp_seed, self.kp_res)
        kp = jnp.asarray(kp_np)
        n_kp = kp.shape[0]

        proj_axes = self.param(
            "proj_axes", _uniform_init(math.sqrt(1.0 / n_kp)),
            (n_kp, self.num_basis),
        )
        proj_biases = self.param(
            "proj_biases", nn.initializers.zeros, (self.num_basis,)
        )
        pe = self.param(
            "pe", _uniform_init(math.sqrt(1.0 / v_size)),
            (1, 1, self.num_basis, v_size),
        )

        # Calibration buffers, identical protocol to PNEConv.
        norm_dist_var = self.variable("calib", "norm_neigh_dist", lambda: jnp.ones(()))
        norm_neighs_var = self.variable("calib", "norm_num_neighs", lambda: jnp.ones(()))
        calib_init_var = self.variable("calib", "initialized", lambda: jnp.zeros((), bool))
        if calibrate and not self.is_initializing():
            if neigh.method == "ball_query":
                new_dist = jnp.asarray(1.0 / neigh.radius)
            else:
                src = jax.vmap(lambda v, i: v[i])(pc_in.positions, neigh.idx)
                d = jnp.sqrt(jnp.sum((src - pc_out.positions[:, :, None, :]) ** 2, -1))
                edges = jnp.maximum(jnp.sum(neigh.mask), 1)
                new_dist = 1.0 / (2.0 * jnp.sum(jnp.where(neigh.mask, d, 0.0)) / edges)
            rows = jnp.sum(neigh.query_mask)
            edges = jnp.maximum(jnp.sum(neigh.mask), 1)
            seen = calib_init_var.value
            norm_dist_var.value = jnp.where(
                seen, 0.9 * norm_dist_var.value + 0.1 * new_dist, new_dist)
            norm_neighs_var.value = jnp.where(
                seen, 0.9 * norm_neighs_var.value + 0.1 * (rows / edges), rows / edges)
            calib_init_var.value = jnp.ones((), bool)
        norm_dist = jax.lax.stop_gradient(norm_dist_var.value)
        norm_neighs = jax.lax.stop_gradient(norm_neighs_var.value)

        # Gaussian kernel-point embedding per edge -> [B, M, K, Q].
        rel = ops.relative_offsets(pc_in, pc_out, neigh, norm_dist)
        pne = ops.kp_pne(rel, kp, sigma, "gauss", proj_axes, proj_biases)
        pne = pne * neigh.mask[..., None]

        # q/v/k projections (reference ``:131-137``).
        x = TorchLinear(3 * v_size, name="linear_kqv")(features)
        qv, k = x[..., : 2 * v_size], x[..., 2 * v_size :]

        # Basis aggregation (the feat_basis_proj of the reference).
        gathered = jax.vmap(lambda v, i: v[i])(qv, neigh.idx)  # [B,M,K,2V]
        agg_qv = jnp.einsum("bmkc,bmkq->bmcq", gathered, pne)
        agg_v = jnp.swapaxes(agg_qv[:, :, :v_size, :], -1, -2)  # [B,M,Q,V]
        agg_q = jnp.swapaxes(agg_qv[:, :, v_size:, :], -1, -2) + pe

        # Multi-head attention over the Q basis slots.
        b, m = agg_v.shape[:2]
        h = self.num_heads
        hs = v_size // h
        qh = agg_q.reshape(b, m, self.num_basis, h, hs)
        kh = k.reshape(b, m, 1, h, hs)
        att = jnp.einsum("bmqhi,bmqhi->bmqh", qh, jnp.broadcast_to(kh, qh.shape))
        att = jax.nn.softmax(att, axis=2)
        vh = agg_v.reshape(b, m, self.num_basis, h, hs)
        out_att = jnp.einsum("bmqhi,bmqh->bmhi", vh, att).reshape(b, m, v_size)
        out = TorchLinear(self.out_features, name="w_out")(out_att)

        if self.with_conv_term:
            conv_w = self.param(
                "conv_weights",
                _uniform_init(math.sqrt(1.0 / (v_size * self.num_basis))),
                (self.num_basis, v_size, self.out_features),
            )
            out = out + jnp.einsum("bmqi,qio->bmo", agg_v, conv_w)
        return out * norm_neighs


class MultiHeadAttConv(_AttBase):
    """Reference ``MultiHeadAttLayer``: attention term only."""

    with_conv_term: bool = False


class LoRAttConv(_AttBase):
    """Reference ``LoRAttConvLayer``: attention + parallel basis conv."""

    with_conv_term: bool = True
