"""Headline benchmark: rot-equivariant PNEConv forward+backward throughput.

Measures the north-star metric of BASELINE.json — PNEConv points/sec/chip,
fwd+bwd — on one full equivariant conv layer (geometry transform + PNE MLP
+ basis projection + weight contraction + gradients w.r.t. parameters and
features), the exact per-layer workload of the reference's hot loop
(``PNEConvLayerRotEquiv.__compute_convolution__`` + CUDA feat_basis_proj
fwd/bwd, SURVEY §3.2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 20e6 (the 20M pts/s/chip target).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from se3conv3d_tpu.core.frames import pca_frames, shuffle_and_select_frames
from se3conv3d_tpu.core.neighborhoods import knn_neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.ops import pne_conv as ops

# Workload: one trunk-level conv of the DFaust rot-equiv config.
B = 1
N = 65536  # points
K = 16  # neighbors
F = 2  # frames (pca_2F)
CB = 32  # basis functions
CI = CO = 64  # channels
TARGET = 20e6


def build_inputs(key):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    pts = jax.random.uniform(k1, (B, N, 3)) * 4.0
    pc = PointCloud(positions=pts, mask=jnp.ones((B, N), bool))
    neigh = knn_neighborhood(pc, pc, K)
    cand = pca_frames(pts, neigh.idx, neigh.mask)
    frames = shuffle_and_select_frames(k2, cand, F)
    pc = pc.with_frames(frames)
    feats = jax.random.normal(k3, (B, N, F, CI))
    proj_axes = jax.random.normal(k4, (9, CB)) * 0.3
    proj_biases = jnp.zeros((CB,))
    weights = jax.random.normal(k5, (CI, CB, CO)) * 0.05
    return pc, neigh, feats, proj_axes, proj_biases, weights


def conv_loss(params, pc, neigh, compute_dtype=None):
    feats, proj_axes, proj_biases, weights = params
    geo = ops.equiv_geometry(pc, pc, neigh, jnp.asarray(10.0), "6D")
    pne = ops.linear_pne(geo, proj_axes, proj_biases, jax.nn.gelu)
    pne = pne * neigh.mask[:, :, :, None, None, None]
    out = ops.equiv_basis_conv(
        pne, feats, neigh, weights, jnp.asarray(1.0 / K),
        compute_dtype=compute_dtype,
    )
    return jnp.sum(out * out)


def time_variant(params, pc, neigh, compute_dtype, iters=20):
    grad_fn = jax.value_and_grad(
        lambda p, pc, nb: conv_loss(p, pc, nb, compute_dtype)
    )

    # Chain iterations through a parameter update so no execution can be
    # cached or elided: every step consumes the previous step's gradients.
    @jax.jit
    def step(params, pc, neigh):
        loss, grads = grad_fn(params, pc, neigh)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - 1e-12 * g, params, grads
        )
        return loss, new_params

    loss, p = step(params, pc, neigh)  # warmup / compile
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, p = step(p, pc, neigh)
    jax.block_until_ready((loss, p))
    dt = time.perf_counter() - t0
    return B * N * iters / dt


def main():
    key = jax.random.PRNGKey(0)
    pc, neigh, feats, proj_axes, proj_biases, weights = build_inputs(key)
    params = (feats, proj_axes, proj_biases, weights)

    # Best of f32 and bf16-multiply/f32-accumulate MXU paths; two passes
    # per variant guard against one-off host jitter.
    pts_per_sec = max(
        time_variant(params, pc, neigh, dtype)
        for dtype in (None, jnp.bfloat16)
        for _ in range(2)
    )
    print(
        json.dumps(
            {
                "metric": "equiv_pneconv_fwd_bwd_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(pts_per_sec / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
