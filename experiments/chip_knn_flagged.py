"""How many kNN rows fail the fine-pass exactness certificate, and what
each backfill branch costs.

The compacted backfill (cbf4633) only pays off when the flagged fraction
is under cap_b/m (25%); past that the lax.cond falls back to coarse
passes over ALL rows.  knn part measured 462 ms on BOTH the volumetric
and the surface workload — suspicious: either the certificate rarely
proves rows at production-like density, or the fast branch isn't
engaging.  This prints, per workload: the flagged fraction, the cap_b
threshold, and the kNN time.

Usage: [N=131072] python experiments/chip_knn_flagged.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from _workload import surface_cloud
from se3conv3d_tpu.core import neighborhoods as nb
from se3conv3d_tpu.core.neighborhoods import (
    _grid_geometry, _grid_topk_neighbors, grid_knn_cell_size,
    knn_neighborhood,
)
from se3conv3d_tpu.core.pointcloud import PointCloud

N = int(os.environ.get("N", "131072"))
K = 16
SPACING = 0.1


def workload(name, key):
    ones = jnp.ones((1, N), bool)
    if name == "surface":
        return surface_cloud(key, N, SPACING), ones
    if name in ("centroid", "rndcell"):
        # what build_hierarchy actually attaches to: grid subsample of
        # the raw surface (cell centroid resp. random point per cell)
        from se3conv3d_tpu.core.grid import build_grid_subsample
        raw = PointCloud(
            positions=surface_cloud(key, N, SPACING), mask=ones)
        smap = build_grid_subsample(
            raw, SPACING, rnd=name == "rndcell",
            rng=jax.random.fold_in(key, 3), capacity=N)
        return smap.subsample(raw.positions, "avg"), smap.out_mask
    pts = jax.random.uniform(key, (1, N, 3)) * 8.0
    return pts.at[:, :, 2].multiply(0.15), ones


from functools import partial


@partial(jax.jit, static_argnums=2)
def flagged_stats(pts, mask, hint):
    """Replicate the fine pass + certificate; return flagged count and
    certificate-part counts (valid rows only)."""
    sp, qp = pts[0], pts[0]
    sm = mask[0]
    cell = grid_knn_cell_size(hint, K)
    h_size = max(1 << (N - 1).bit_length(), 1024)
    res = _grid_topk_neighbors(sp, sm, qp, sm, K, None, cell, 3, h_size, 16)
    idx1, ok1, d21, cap_md2 = res[:4]
    origin, dims = _grid_geometry(sp, sm, cell)
    qcell = jnp.floor((qp - origin) / cell).astype(jnp.int32)
    inf = jnp.asarray(jnp.inf, sp.dtype)
    cov_lo = jnp.where(qcell - 1 >= 0, qp - (origin + (qcell - 1) * cell), inf)
    cov_hi = jnp.where(
        qcell + 1 <= dims[None, :] - 1, origin + (qcell + 2) * cell - qp, inf
    )
    cov = jnp.min(jnp.minimum(cov_lo, cov_hi), axis=-1)
    cnt = jnp.sum(ok1, axis=1)
    have_k = cnt >= K
    fits = d21[:, -1] <= cov * cov
    no_cap = ~(cap_md2 < d21[:, -1])
    exact = have_k & fits & no_cap
    v = sm
    return (
        jnp.sum(~exact & v), jnp.sum(~have_k & v),
        jnp.sum(have_k & ~fits & v), jnp.sum(have_k & fits & ~no_cap & v),
        jnp.sum(v),
    )


@partial(jax.jit, static_argnums=3)
def knn_time(seed, pts, mask, hint):
    def step(c, _):
        pc = PointCloud(positions=pts * (1 + 1e-12 * c), mask=mask)
        out = knn_neighborhood(pc, pc, K, grid_cell_size=hint)
        return c + jnp.sum(out.idx[:, :128].astype(jnp.float32)), ()

    c, _ = jax.lax.scan(step, jnp.zeros(()) + seed * 0.0, None, length=4)
    return c


if __name__ == "__main__":
    from se3conv3d_tpu.core.neighborhoods import SUBSAMPLED_SPACING_FACTOR
    cap_b = min(N, max(4096, N // 4))
    names = os.environ.get(
        "W", "surface,centroid,rndcell,volumetric").split(",")
    for name in names:
        key = jax.random.PRNGKey(7)
        pts, mask = workload(name, key)
        hint = (SPACING * SUBSAMPLED_SPACING_FACTOR
                if name in ("centroid", "rndcell") else SPACING)
        nf, miss_k, miss_cov, miss_cap, nv = (
            int(x) for x in jax.device_get(flagged_stats(pts, mask, hint))
        )
        t0 = time.perf_counter()
        float(jax.device_get(knn_time(0, pts, mask, hint)))
        tc = time.perf_counter() - t0
        best = 1e9
        for s in (1, 2):
            t0 = time.perf_counter()
            float(jax.device_get(knn_time(s, pts, mask, hint)))
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name}: flagged {nf}/{nv} ({100*nf/max(nv,1):.1f}%) "
            f"cap_b={cap_b} "
            f"[<k: {miss_k}, cov: {miss_cov}, cap: {miss_cap}] "
            f"knn {best/4*1e3:.1f} ms (compile {tc:.0f}s)",
            flush=True,
        )
