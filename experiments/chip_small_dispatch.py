"""Brute vs grid at mid sizes (8k-32k): is GRID_AUTO_THRESHOLD stale?

The 32k threshold was set before the variadic-sort + w2 rounds made the
grid path ~3x faster.  The 131k ScanNet config runs levels 1-2 (32k/8k)
and the 65k bucket runs its 16k level through BRUTE kNN/BQ today; the
65k train step's superlinear jump (0.64 -> 1.70 s from 32k -> 65k)
points at the 16k brute neighborhoods.

Usage: python experiments/chip_small_dispatch.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from _workload import surface_cloud
from se3conv3d_tpu.core import neighborhoods as nb
from se3conv3d_tpu.core.pointcloud import PointCloud

K = 16
S = 4


def run(n, mode, kind, spacing):
    thr = 1 if mode == "grid" else 10**9

    def body(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        pts = surface_cloud(key, n, spacing=spacing)
        mask = jnp.ones((1, n), bool)

        def step(c, _):
            pc = PointCloud(positions=pts * (1 + 1e-12 * c), mask=mask)
            old = nb.GRID_AUTO_THRESHOLD
            nb.GRID_AUTO_THRESHOLD = thr
            try:
                if kind == "knn":
                    out = nb.knn_neighborhood(
                        pc, pc, K, grid_cell_size=1.3 * spacing)
                else:
                    out = nb.ball_query_neighborhood(
                        pc, pc, 2.0 * spacing, 24, cell_cap=16)
            finally:
                nb.GRID_AUTO_THRESHOLD = old
            return c + jnp.sum(out.idx[:, :128].astype(jnp.float32)), ()

        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
        return c

    bench = jax.jit(body)
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
    print(f"{kind:4s} {mode:5s} n={n:6d}: {best/S*1e3:8.2f} ms"
          f" (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    # spacing scaled so density matches a ScanNet level of that size
    for n, spacing in ((8192, 0.4), (16384, 0.28), (32768, 0.2)):
        for kind in ("knn", "bq"):
            for mode in ("brute", "grid"):
                run(n, mode, kind, spacing)
