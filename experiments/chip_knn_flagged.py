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
    if name == "surface":
        return surface_cloud(key, N, SPACING)
    pts = jax.random.uniform(key, (1, N, 3)) * 8.0
    return pts.at[:, :, 2].multiply(0.15)


@jax.jit
def flagged_stats(pts):
    """Replicate the fine pass + certificate; return flagged count and
    certificate-part counts."""
    sp, qp = pts[0], pts[0]
    sm = jnp.ones((N,), bool)
    cell = grid_knn_cell_size(SPACING, K)
    h_size = max(1 << (N - 1).bit_length(), 1024)
    res = _grid_topk_neighbors(sp, sm, qp, sm, K, None, cell, 3, h_size, 32)
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
    return (
        jnp.sum(~exact), jnp.sum(~have_k), jnp.sum(have_k & ~fits),
        jnp.sum(have_k & fits & ~no_cap),
    )


@jax.jit
def knn_time(seed, pts):
    mask = jnp.ones((1, N), bool)

    def step(c, _):
        pc = PointCloud(positions=pts * (1 + 1e-12 * c), mask=mask)
        out = knn_neighborhood(pc, pc, K, grid_cell_size=SPACING)
        return c + jnp.sum(out.idx[:, :128].astype(jnp.float32)), ()

    c, _ = jax.lax.scan(step, jnp.zeros(()) + seed * 0.0, None, length=4)
    return c


if __name__ == "__main__":
    cap_b = min(N, max(4096, N // 4))
    for name in ("surface", "volumetric"):
        key = jax.random.PRNGKey(7)
        pts = workload(name, key)
        nf, miss_k, miss_cov, miss_cap = (
            int(x) for x in jax.device_get(flagged_stats(pts))
        )
        t0 = time.perf_counter()
        float(jax.device_get(knn_time(0, pts)))
        tc = time.perf_counter() - t0
        best = 1e9
        for s in (1, 2):
            t0 = time.perf_counter()
            float(jax.device_get(knn_time(s, pts)))
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name}: flagged {nf}/{N} ({100*nf/N:.1f}%) cap_b={cap_b} "
            f"[<k: {miss_k}, cov: {miss_cov}, cap: {miss_cap}] "
            f"knn {best/4*1e3:.1f} ms (compile {tc:.0f}s)",
            flush=True,
        )
