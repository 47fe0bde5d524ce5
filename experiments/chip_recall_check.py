"""On-chip recall of the grid kNN vs the brute-force oracle.

The CPU test suite pins recall, but the r3 session-E denormal-flush bug
(f32-bitcast index bits corrupt in TPU data movement) was only visible
ON CHIP — the grid path returned idx=0 everywhere while every CPU test
stayed green.  This runs both paths on the attached chip at a
grid-engaging size and prints exact-set recall.

Usage: [N=40960] python experiments/chip_recall_check.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

from _workload import surface_cloud
from se3conv3d_tpu.core.neighborhoods import knn_neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud

N = int(os.environ.get("N", "40960"))
K = 16
SPACING = 0.1
CAP = int(os.environ.get("CAP", "0"))  # 0 -> library default
COARSE = int(os.environ.get("COARSE", "0"))  # 0 -> library default


@jax.jit
def both():
    pts = surface_cloud(jax.random.PRNGKey(11), N, SPACING)
    pc = PointCloud(positions=pts, mask=jnp.ones((1, N), bool))
    kw = {"cell_cap": CAP} if CAP else {}
    if COARSE:
        kw["coarse_cell_cap"] = COARSE
    grid = knn_neighborhood(pc, pc, K, grid_cell_size=SPACING, **kw)
    brute = knn_neighborhood(pc, pc, K)  # no hint -> brute path
    return grid.idx, grid.mask, brute.idx, brute.mask, pts


if __name__ == "__main__":
    gi, gm, bi, bm, pts = (np.asarray(x) for x in jax.device_get(both()))
    # set recall with distance ties tolerated: a grid pick is a hit when
    # it is no farther than the brute k-th distance
    p = pts[0]
    qs = np.random.default_rng(0).choice(N, 2048, replace=False)
    d_brute = np.linalg.norm(p[qs][:, None] - p[bi[0][qs]], axis=-1)
    kth = d_brute.max(axis=1)
    d_grid = np.linalg.norm(p[qs][:, None] - p[gi[0][qs]], axis=-1)
    hits = (d_grid <= kth[:, None] * (1 + 1e-5) + 1e-7) & gm[0][qs]
    recall = hits.sum() / (K * len(qs))
    uniq = np.mean([len(set(r)) for r in gi[0][qs]])
    print(f"N={N} recall={recall:.5f} mean-unique-idx={uniq:.1f}/{K}",
          flush=True)
    assert recall >= 0.999, recall
    print("OK", flush=True)
