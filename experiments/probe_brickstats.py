"""Brick-overlap statistics for the cell-blocked conv design.

Points sorted by grid cell, chunked into bricks of P consecutive points.
For each query brick: how many source bricks contain ANY point within
radius r of ANY query point (upper-bounded here by AABB dilation)?  That
count R is the kernel's inner-loop length; its p100 across bricks sets
the static cap (overflow would drop neighbor contributions).

Runs on CPU (numpy), surface workload like production.

Usage: python experiments/probe_brickstats.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from _workload import surface_cloud


def morton(ck):
    """Interleave 3x16-bit cell coords into a z-order key."""
    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x
    return (spread(ck[:, 0]) | (spread(ck[:, 1]) << np.uint64(1))
            | (spread(ck[:, 2]) << np.uint64(2)))


ORDER = os.environ.get("ORDER", "morton")


def stats(pts, r, P, label):
    n = pts.shape[0]
    cell = r  # grid cell = radius
    mn = pts.min(0)
    ck = np.floor((pts - mn) / cell).astype(np.int64)
    dims = ck.max(0) + 1
    if ORDER == "morton":
        key = morton(ck)
    else:
        key = (ck[:, 2] * dims[1] + ck[:, 1]) * dims[0] + ck[:, 0]
    order = np.argsort(key, kind="stable")
    p = pts[order]
    npad = ((n + P - 1) // P) * P
    p = np.vstack([p, np.full((npad - n, 3), 1e9, np.float32)])
    bricks = p.reshape(-1, P, 3)
    nb = bricks.shape[0]
    valid = bricks[:, :, 0] < 1e8
    lo = np.where(valid[:, :, None], bricks, np.inf).min(1)
    hi = np.where(valid[:, :, None], bricks, -np.inf).max(1)
    # AABB pair distance: bricks j overlapping query brick i's r-dilation
    # chunked to bound memory
    counts = np.zeros(nb, np.int64)
    for i0 in range(0, nb, 256):
        i1 = min(i0 + 256, nb)
        d = np.maximum(
            lo[i0:i1, None] - hi[None, :], lo[None, :] - hi[i0:i1, None]
        )
        d = np.maximum(d, 0.0)
        d2 = (d ** 2).sum(-1)
        counts[i0:i1] = (d2 < r * r).sum(1)
    q = np.percentile(counts, [50, 90, 99, 100])
    # exact mean ball occupancy for reference
    occ_s = 0
    sub = np.random.default_rng(0).choice(n, 2000, replace=False)
    for i in sub:
        occ_s += ((pts - pts[i]) ** 2).sum(1) < r * r
    print(f"{label}: n={n} nb={nb} R p50={q[0]:.0f} p90={q[1]:.0f} "
          f"p99={q[2]:.0f} max={q[3]:.0f} mean={counts.mean():.1f} "
          f"ball_occ={(occ_s.sum() / 2000):.1f}")


key = jax.random.PRNGKey(0)
raw = np.asarray(surface_cloud(key, 131072, spacing=0.1)[0])


def gridsub(pts, cell):
    mn = pts.min(0)
    ck = np.floor((pts - mn) / cell).astype(np.int64)
    dims = ck.max(0) + 1
    k = (ck[:, 2] * dims[1] + ck[:, 1]) * dims[0] + ck[:, 0]
    _, idx = np.unique(k, return_index=True)
    return pts[idx]


for P in (128, 256):
    stats(raw, 0.2, P, f"P={P} raw131k r=0.2(patch)")
    l0 = gridsub(raw, 0.2)
    stats(l0, 0.4, P, f"P={P} lvl0({len(l0)}) r=0.4(blocks)")
    l1 = gridsub(raw, 0.4)
    stats(l1, 0.8, P, f"P={P} lvl1({len(l1)}) r=0.8")
