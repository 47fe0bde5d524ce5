"""Per-part costs of the ScanNet hierarchy build at 131k points.

ROADMAP round-3: hierarchy ~750 ms is the biggest remaining chunk of the
3.06 s step.  Break it down:
  subsample  - build_grid_subsample at 131k (the init/out subsamples)
  knn        - frames kNN (multiscale grid union) 131k self k=16
  pca        - pca_frames given a prebuilt neighbor table (the [N,K,3]
               position gather + cov + closed-form eigh + sign sets)
  attach     - full attach_frames (knn + pca + shuffle)
  hier       - full build_hierarchy (ScanNet config)

Usage: PART=<name> [N=131072] python experiments/chip_hier_parts.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from _workload import surface_cloud
from se3conv3d_tpu.core.frames import pca_frames, pca_frames_from_components
from se3conv3d_tpu.core.grid import build_grid_subsample
from se3conv3d_tpu.core.hierarchy import (
    FrameConfig, HierarchyConfig, attach_frames, build_hierarchy,
)
from se3conv3d_tpu.core.neighborhoods import (
    SUBSAMPLED_SPACING_FACTOR, knn_neighborhood,
)
from se3conv3d_tpu.core.pointcloud import PointCloud

PARTS = (
    sys.argv[1] if len(sys.argv) > 1 else os.environ.get("PART", "hier")
).split(",")
N = int(os.environ.get("N", "131072"))
S = 4
FCFG = FrameConfig(n_frames=1, pca=True, neigh_k=16, fixed_axis=2)


def _bench(PART, seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    # surface workload at production density (spacing == the 0.1 hint):
    # the kNN certificate / backfill lax.cond is data-dependent, so the
    # distribution picks which branch gets measured (_workload.py).
    pts = surface_cloud(key, N, spacing=0.1)
    mask = jnp.ones((1, N), bool)

    def step(c, _):
        eps = 1 + 1e-12 * c
        pc = PointCloud(positions=pts * eps, mask=mask)
        if PART == "subsample":
            smap = build_grid_subsample(pc, 0.1, capacity=N)
            return c + jnp.sum(smap.cell_id[:, :128].astype(jnp.float32)), ()
        if PART == "knn":
            nb = knn_neighborhood(pc, pc, 16, grid_cell_size=0.1)
            return c + jnp.sum(nb.idx[:, :128].astype(jnp.float32)), ()
        if PART == "pca":
            nb = knn_neighborhood(
                PointCloud(positions=pts, mask=mask),
                PointCloud(positions=pts, mask=mask), 16,
                grid_cell_size=0.1)
            fr = pca_frames(pc.positions, nb.idx, nb.mask, fixed_axis=2)
            return c + jnp.sum(fr[:, :128].astype(jnp.float32)), ()
        if PART == "pcac":
            # gather-free path: positions ride the kNN payload sorts
            nb = knn_neighborhood(
                PointCloud(positions=pts, mask=mask),
                PointCloud(positions=pts, mask=mask), 16,
                grid_cell_size=0.1, want_positions=True)
            fr = pca_frames_from_components(
                pc.positions, nb.neigh_pos, nb.mask, fixed_axis=2)
            return c + jnp.sum(fr[:, :128].astype(jnp.float32)), ()
        if PART == "attach":
            out = attach_frames(jax.random.fold_in(key, 1), pc, FCFG,
                                spacing=0.1)
            return c + jnp.sum(out.frames[:, :128].astype(jnp.float32)), ()
        if PART in ("attach0", "attachout"):
            # attach on the cloud build_hierarchy actually attaches to:
            # cell-centroid (level 0) resp. random-point-per-cell (out)
            # subsample of the raw surface — the kNN certificate is
            # data-dependent, so these may take different branches than
            # the raw surface.
            smap = build_grid_subsample(
                pc, 0.1, rnd=PART == "attachout",
                rng=jax.random.fold_in(key, 2), capacity=N)
            sub = PointCloud(positions=smap.subsample(pc.positions, "avg"),
                             mask=smap.out_mask)
            out = attach_frames(
                jax.random.fold_in(key, 1), sub, FCFG,
                spacing=SUBSAMPLED_SPACING_FACTOR * 0.1)
            return c + jnp.sum(out.frames[:, :128].astype(jnp.float32)), ()
        if PART in ("hier", "hier_nf"):
            caps = tuple(max(N // d, 64) for d in (1, 4, 16, 64, 256))
            hcfg = HierarchyConfig(
                init_cell_size=0.1, cell_sizes=(0.2, 0.4, 0.8, 1.6),
                capacities=caps, out_cell_size=0.1, out_capacity=N,
                frames=None if PART == "hier_nf" else FCFG)
            h, f0, out_pc, _, _ = build_hierarchy(
                jax.random.fold_in(key, 1), pc.positions, mask,
                jnp.ones((1, N, 3)), hcfg)
            live = lambda p: (p.positions if p.frames is None else p.frames)
            tot = jnp.sum(live(out_pc)[:, :128].astype(jnp.float32))
            for lev in h.levels:
                tot += jnp.sum(live(lev)[:, :64].astype(jnp.float32))
            return c + tot, ()
        raise ValueError(PART)

    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c


if __name__ == "__main__":
    # one process, many parts: the ~110 s backend init amortises
    for part in PARTS:
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
