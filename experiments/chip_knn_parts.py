"""Decompose the 131k grid-kNN cost: fine pass vs union sorts vs coarse.

The two big frame attaches are ~366 ms of the 812 ms pre-conv step
(r3 session G); knn_neighborhood itself is ~183 ms of each.  Parts:
  fine    - _grid_topk_neighbors 3^3 window at the fine cell only
  finedup - fine + the union_topk dedup sort pair
  knn     - full knn_neighborhood (fine + certificate + subset coarse)
  coarse1 - one coarse pass (3x cell, cap 32) over cap_b=m/4 queries
            (the compacted backfill's marginal cost, x2 in production)

Usage: PART=fine,finedup,knn,coarse1 [N=131072] python experiments/chip_knn_parts.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from _workload import surface_cloud
from se3conv3d_tpu.core.neighborhoods import (
    SUBSAMPLED_SPACING_FACTOR, _grid_topk_neighbors,
    _grid_topk_neighbors_w2, grid_knn_cell_size, knn_neighborhood,
)
from se3conv3d_tpu.core.pointcloud import PointCloud

PARTS = (
    sys.argv[1] if len(sys.argv) > 1 else os.environ.get("PART", "knn")
).split(",")
N = int(os.environ.get("N", "131072"))
K = 16
S = 4
HINT = 0.1 * SUBSAMPLED_SPACING_FACTOR  # production: subsampled clouds
CELL = grid_knn_cell_size(HINT, K)


def union_topk(ci, cd, qmask):
    ci, cd = jax.lax.sort((ci, cd), dimension=1, num_keys=1, is_stable=True)
    dup = jnp.concatenate(
        [jnp.zeros_like(ci[:, :1], bool), ci[:, 1:] == ci[:, :-1]], axis=1)
    cd = jnp.where(dup | (ci < 0), jnp.inf, cd)
    cd, ci = jax.lax.sort((cd, ci), dimension=1, num_keys=1, is_stable=True)
    ok = jnp.isfinite(cd[:, :K]) & qmask[:, None]
    return jnp.where(ok, ci[:, :K], 0), ok, cd[:, :K]


def _bench(PART, seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts = surface_cloud(key, N, spacing=0.1)
    mask = jnp.ones((1, N), bool)
    h_size = max(1 << (N - 1).bit_length(), 1024)
    cap_b = min(N, max(4096, N // 4))

    def step(c, _):
        p = (pts * (1 + 1e-12 * c))[0]
        m = mask[0]
        if PART == "knn":
            nb = knn_neighborhood(
                PointCloud(positions=pts * (1 + 1e-12 * c), mask=mask),
                PointCloud(positions=pts, mask=mask), K,
                grid_cell_size=HINT)
            return c + jnp.sum(nb.idx[:, :128].astype(jnp.float32)), ()
        if PART in ("fine", "finedup"):
            idx, ok, d2, cap_md2 = _grid_topk_neighbors(
                p, m, p, m, K, None, CELL, 3, h_size, 16)[:4]
            if PART == "finedup":
                idx, ok, d2 = union_topk(
                    jnp.where(ok, idx, -1), jnp.where(ok, d2, jnp.inf), m)
            return c + jnp.sum(idx[:, :K].astype(jnp.float32)), ()
        if PART == "coarse1":
            qp = p[:cap_b]
            idx, ok, d2, _ = _grid_topk_neighbors(
                p, m, qp, m[:cap_b], K, None, 3.0 * CELL, 3, h_size, 32)[:4]
            return c + jnp.sum(idx[:, :K].astype(jnp.float32)), ()
        if PART.startswith("finew2_"):
            # 2x2x2 window at coverage = the fine cell: 8 fat rows vs 27.
            # Session D's retry used volume-scaled caps (288) sized for
            # the pre-hint-fix cells; the corrected 1.3x hint means
            # ~24 surface points per 2*coverage cell — try tight caps.
            cap = int(PART.split("_")[1])
            idx, ok, d2, cap_md2 = _grid_topk_neighbors_w2(
                p, m, p, m, K, None, CELL, h_size, cap)[:4]
            return c + jnp.sum(idx[:, :K].astype(jnp.float32)), ()
        raise ValueError(PART)

    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c


def _flagw2_stats(cap):
    """Certification rate of a w2 fine pass on the centroid workload."""
    from se3conv3d_tpu.core.grid import build_grid_subsample
    from se3conv3d_tpu.core.neighborhoods import _grid_geometry

    @jax.jit
    def stats(key):
        raw = PointCloud(
            positions=surface_cloud(key, N, spacing=0.1),
            mask=jnp.ones((1, N), bool))
        smap = build_grid_subsample(raw, 0.1, capacity=N)
        p = smap.subsample(raw.positions, "avg")[0]
        m = smap.out_mask[0]
        h_size = max(1 << (N - 1).bit_length(), 1024)
        idx, ok, d2, cap_md2 = _grid_topk_neighbors_w2(
            p, m, p, m, K, None, CELL, h_size, cap)[:4]
        s = 2.0 * CELL
        origin, dims = _grid_geometry(p, m, s)
        lo = jnp.floor((p - CELL - origin) / s).astype(jnp.int32)
        inf = jnp.asarray(jnp.inf, p.dtype)
        cov_lo = jnp.where(lo >= 0, p - (origin + lo * s), inf)
        cov_hi = jnp.where(
            lo + 1 <= dims[None, :] - 1, origin + (lo + 2) * s - p, inf)
        cov = jnp.min(jnp.minimum(cov_lo, cov_hi), axis=-1)
        cnt = jnp.sum(ok, axis=1)
        exact = (cnt >= K) & (d2[:, -1] <= cov * cov) & ~(cap_md2 < d2[:, -1])
        return jnp.sum(~exact & m), jnp.sum(m)

    nf, nv = (int(x) for x in jax.device_get(stats(jax.random.PRNGKey(7))))
    print(f"flagw2_{cap} N={N}: flagged {nf}/{nv} ({100*nf/max(nv,1):.1f}%)",
          flush=True)


if __name__ == "__main__":
    for part in PARTS:
        if part.startswith("flagw2_"):
            _flagw2_stats(int(part.split("_")[1]))
            continue
        bench = jax.jit(lambda seed, p=part: _bench(p, seed))
        s0 = int.from_bytes(os.urandom(4), "little") % (2**31)
        t0 = time.perf_counter()
        float(jax.device_get(bench(s0)))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(2):
            s1 = int.from_bytes(os.urandom(4), "little") % (2**31)
            t0 = time.perf_counter()
            float(jax.device_get(bench(s1)))
            best = min(best, time.perf_counter() - t0)
        print(f"{part} N={N}: {best/S*1e3:8.2f} ms (compile {tc:.0f}s)",
              flush=True)
