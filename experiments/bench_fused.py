"""Honest chip benchmark: fused Pallas conv vs XLA einsum path.

Measurement discipline per CLAUDE.md: entropy-fresh inputs each invocation,
timed region is a scan over S distinct pre-staged input sets feeding a
carried checksum, single shot after untimed warmup on a separate set,
sanity MFU print against the 197 TFLOP/s v5e bf16 peak.

Usage: python experiments/bench_fused.py [xla|fused|fused_bf16 ...] [--fwd]
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3conv3d_tpu.core.frames import pca_frames, shuffle_and_select_frames
from se3conv3d_tpu.core.neighborhoods import Neighborhood, knn_neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.ops import pne_conv as ops

B, N, K, F, Q, CI, CO = 1, 65536, 16, 2, 32, 64, 64
S = 4
PEAK = 197e12


def flops_fwd_bwd():
    edges = B * N * K * F * F
    f_pne = 2.0 * edges * 9 * Q
    f_agg = 2.0 * B * N * F * Q * CI * (K * F)
    f_out = 2.0 * B * N * F * CI * Q * CO
    return 3.0 * (f_pne + f_agg + f_out)


def build_inputs(key):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    pts = jax.random.uniform(k1, (B, N, 3)) * 4.0
    pc = PointCloud(positions=pts, mask=jnp.ones((B, N), bool))
    neigh = knn_neighborhood(pc, pc, K)
    cand = pca_frames(pts, neigh.idx, neigh.mask)
    frames = shuffle_and_select_frames(k2, cand, F)
    return {
        "positions": pts,
        "frames": frames,
        "idx": neigh.idx,
        "nmask": neigh.mask,
        "params": (
            jax.random.normal(k3, (B, N, F, CI)),
            jax.random.normal(k4, (9, Q)) * 0.3,
            jax.random.normal(k5, (Q,)) * 0.02,
            jax.random.normal(k6, (CI, Q, CO)) * 0.05,
        ),
    }


def conv_out(variant, params, positions, frames, idx, nmask):
    feats, pa, pb, w = params
    pc = PointCloud(positions=positions, mask=jnp.ones((B, N), bool), frames=frames)
    neigh = Neighborhood(idx=idx, mask=nmask, query_mask=jnp.ones((B, N), bool))
    nd, nn = jnp.asarray(10.0), jnp.asarray(1.0 / K)
    if variant == "xla":
        geo = ops.equiv_geometry(pc, pc, neigh, nd, "6D")
        pne = ops.linear_pne(geo, pa, pb, jax.nn.gelu)
        pne = pne * nmask[:, :, :, None, None, None]
        return ops.equiv_basis_conv(pne, feats, neigh, w, nn)
    cdt = "bfloat16" if variant == "fused_bf16" else None
    return ops.fused_equiv_conv(
        pc, pc, neigh, feats, pa, pb, w, nd, nn, compute_dtype=cdt
    )


def make_run(variant, with_bwd=True):
    def loss(params, positions, frames, idx, nmask):
        out = conv_out(variant, params, positions, frames, idx, nmask)
        return jnp.sum(out * out)

    vg = jax.value_and_grad(loss)

    @jax.jit
    def run(stacked):
        def step(carry, inp):
            if with_bwd:
                l, grads = vg(
                    inp["params"], inp["positions"], inp["frames"],
                    inp["idx"], inp["nmask"],
                )
                gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
                return carry + l + gsum, ()
            out = conv_out(
                variant, inp["params"], inp["positions"], inp["frames"],
                inp["idx"], inp["nmask"],
            )
            return carry + jnp.sum(out), ()

        carry, _ = jax.lax.scan(step, jnp.zeros(()), stacked)
        return carry

    return run


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_bwd = "--fwd" not in sys.argv
    variants = args or ["xla", "fused", "fused_bf16"]
    seed = int.from_bytes(os.urandom(8), "little") % (2**31)
    keys = jax.random.split(jax.random.PRNGKey(seed), 2 * S)

    @jax.jit
    def build_all(ks):
        return jax.vmap(build_inputs)(ks)

    print("staging inputs...", flush=True)
    sa = jax.block_until_ready(build_all(keys[:S]))
    sb = jax.block_until_ready(build_all(keys[S:]))
    fl = flops_fwd_bwd() if with_bwd else flops_fwd_bwd() / 3.0

    for v in variants:
        try:
            run = make_run(v, with_bwd)
            t0 = time.perf_counter()
            jax.block_until_ready(run(sa))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(run(sb))
            dt = (time.perf_counter() - t0) / S
            pps = B * N / dt
            mfu = fl / dt / PEAK
            tag = "fwd+bwd" if with_bwd else "fwd"
            print(
                f"{v:12s} {tag}: {dt*1e3:8.2f} ms/step  {pps/1e6:7.2f} M pts/s"
                f"  mfu {mfu:6.2%}  (compile {tc:.0f}s)", flush=True,
            )
            if mfu > 1.0:
                print("  !! MFU > 100% — measurement invalid", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{v:12s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
