"""Headline benchmark: rot-equivariant PNEConv forward+backward throughput.

Measures the north-star metric of BASELINE.json — PNEConv points/sec/chip,
fwd+bwd — on one full equivariant conv layer (geometry transform + PNE MLP
+ basis projection + weight contraction + gradients w.r.t. parameters and
features), the exact per-layer workload of the reference's hot loop
(``PNEConvLayerRotEquiv.__compute_convolution__`` + CUDA feat_basis_proj
fwd/bwd, SURVEY §3.2).

Measurement discipline (this platform serves identical (executable, input)
executions from a cache — across processes):

  * every invocation derives its inputs from ``os.urandom`` entropy, so no
    two invocations ever replay the same execution stream;
  * the timed region is a ``lax.scan`` over S *distinct* pre-staged input
    sets whose per-step results feed a carried checksum, so no iteration
    can be elided or served from cache within the run;
  * the analytic FLOP count of the conv math is printed alongside the
    achieved TFLOP/s and MFU against the chip's bf16 peak, and the bench
    HARD-FAILS if the implied MFU exceeds 100% (a physically impossible
    number means the measurement is invalid).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
where vs_baseline is value / 20e6 (the 20M pts/s/chip target).
"""
from __future__ import annotations

import json
import os
import sys
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

S = 8  # independent input sets chained through the timed scan

# TPU v5e peak: 197 TFLOP/s bf16 (f32 runs lower; using the bf16 peak for
# the MFU guard is conservative — nothing can legitimately exceed it).
PEAK_FLOPS = 197e12


def conv_flops_fwd_bwd() -> float:
    """Analytic matmul FLOPs of one conv fwd+bwd at the bench shapes.

    fwd: PNE projection (E x 9 @ 9 x CB), neighbor aggregation
    (contraction K*F), weight contraction (contraction CB*CI).
    bwd: two aggregation-shaped contractions (d_pne, d_gathered), two
    weight-shaped (d_mid, dW), one PNE-shaped (d_proj) — i.e. 3x fwd.
    Elementwise work (gelu, masks) excluded: this is the matmul floor.
    """
    edges = B * N * K * F * F
    f_pne = 2.0 * edges * 9 * CB
    f_agg = 2.0 * B * N * F * CB * CI * (K * F)
    f_out = 2.0 * B * N * F * CI * CB * CO
    return 3.0 * (f_pne + f_agg + f_out)


def build_inputs(key):
    """One independent input set (geometry + params) on device."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    pts = jax.random.uniform(k1, (B, N, 3)) * 4.0
    pc = PointCloud(positions=pts, mask=jnp.ones((B, N), bool))
    neigh = knn_neighborhood(pc, pc, K)
    cand = pca_frames(pts, neigh.idx, neigh.mask)
    frames = shuffle_and_select_frames(k2, cand, F)
    feats = jax.random.normal(k3, (B, N, F, CI))
    proj_axes = jax.random.normal(k4, (9, CB)) * 0.3
    proj_biases = jnp.zeros((CB,))
    weights = jax.random.normal(k5, (CI, CB, CO)) * 0.05
    return {
        "positions": pts,
        "frames": frames,
        "idx": neigh.idx,
        "nmask": neigh.mask,
        "params": (feats, proj_axes, proj_biases, weights),
    }


def conv_loss(params, positions, frames, idx, nmask, compute_dtype=None):
    from se3conv3d_tpu.core.neighborhoods import Neighborhood

    feats, proj_axes, proj_biases, weights = params
    pc = PointCloud(
        positions=positions, mask=jnp.ones((B, N), bool), frames=frames
    )
    neigh = Neighborhood(
        idx=idx, mask=nmask, query_mask=jnp.ones((B, N), bool)
    )
    geo = ops.equiv_geometry(pc, pc, neigh, jnp.asarray(10.0), "6D")
    pne = ops.linear_pne(geo, proj_axes, proj_biases, jax.nn.gelu)
    pne = pne * nmask[:, :, :, None, None, None]
    out = ops.equiv_basis_conv(
        pne, feats, neigh, weights, jnp.asarray(1.0 / K),
        compute_dtype=compute_dtype,
    )
    return jnp.sum(out * out)


def make_timed_fn(compute_dtype):
    grad_fn = jax.value_and_grad(
        lambda p, pos, fr, idx, m: conv_loss(p, pos, fr, idx, m, compute_dtype)
    )

    @jax.jit
    def run(stacked):
        """Scan over S distinct input sets; every step feeds the carry."""

        def step(carry, inp):
            loss, grads = grad_fn(
                inp["params"], inp["positions"], inp["frames"],
                inp["idx"], inp["nmask"],
            )
            # Consume the gradients so neither the backward pass nor the
            # loss can be dead-code-eliminated.
            gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return carry + loss + gsum, ()

        carry, _ = jax.lax.scan(step, jnp.zeros(()), stacked)
        return carry

    return run


def time_variant(stacked_a, stacked_b, compute_dtype):
    """Compile+warm on set A, time a single shot on never-seen set B."""
    run = make_timed_fn(compute_dtype)
    jax.block_until_ready(run(stacked_a))  # compile + warmup (untimed)
    t0 = time.perf_counter()
    jax.block_until_ready(run(stacked_b))
    dt = time.perf_counter() - t0
    return B * N * S / dt, dt / S


def main():
    seed = int.from_bytes(os.urandom(8), "little") % (2**31)
    keys = jax.random.split(jax.random.PRNGKey(seed), 2 * S)

    @jax.jit
    def build_all(ks):
        return jax.vmap(build_inputs)(ks)

    stacked_a = jax.block_until_ready(build_all(keys[:S]))
    stacked_b = jax.block_until_ready(build_all(keys[S:]))

    flops = conv_flops_fwd_bwd()
    results = []
    for dtype in (None, jnp.bfloat16):
        pts_per_sec, sec_per_step = time_variant(stacked_a, stacked_b, dtype)
        mfu = flops / sec_per_step / PEAK_FLOPS
        results.append((pts_per_sec, sec_per_step, mfu, dtype))
    pts_per_sec, sec_per_step, mfu, dtype = max(results, key=lambda r: r[0])

    if mfu > 1.0:
        print(
            f"BENCH INVALID: implied MFU {mfu:.2%} exceeds 100% of the "
            f"{PEAK_FLOPS/1e12:.0f} TFLOP/s chip peak - measurement artifact",
            file=sys.stderr,
        )
        sys.exit(1)

    print(
        json.dumps(
            {
                "metric": "equiv_pneconv_fwd_bwd_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(pts_per_sec / TARGET, 4),
                "sec_per_step": round(sec_per_step, 6),
                "flops_per_step": flops,
                "achieved_tflops": round(flops / sec_per_step / 1e12, 3),
                "mfu_vs_bf16_peak": round(mfu, 4),
                "dtype": "bf16" if dtype is not None else "f32",
                "entropy_seed": seed,
            }
        )
    )


if __name__ == "__main__":
    main()
