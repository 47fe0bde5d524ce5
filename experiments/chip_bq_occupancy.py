"""Ball-query occupancy at the ScanNet model's request radii.

max_neighbors=32 is OUR static cap (the reference's BQ keeps everything
in radius, reference ball_query.cu semantics); if the true occupancy is
~8-12 the conv pays 2-3x the needed gather/scatter rows.  For every
neighborhood the FPNSegUNet ScanNet step requests, print the mean valid
neighbor count and the fraction of rows that hit the cap at cap=32 and
at candidate caps.

Usage: [N=131072] python experiments/chip_bq_occupancy.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from _workload import surface_cloud
from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig, build_hierarchy
from se3conv3d_tpu.core.neighborhoods import ball_query_neighborhood
from se3conv3d_tpu.models import get_model_spec

N = int(os.environ.get("N", "131072"))
spec = get_model_spec("FPNSegUNetMLPGeluRotEqScanNet")
caps = tuple(max(N // d, 64) for d in (1, 4, 16, 64, 256))
hcfg = HierarchyConfig(init_cell_size=0.1, cell_sizes=(0.2, 0.4, 0.8, 1.6),
    capacities=caps, out_cell_size=0.1, out_capacity=N,
    frames=FrameConfig(n_frames=1, pca=True, neigh_k=16, fixed_axis=2))


@jax.jit
def stats(key):
    pts = surface_cloud(key, N, spacing=0.1)
    mask = jnp.ones((1, N), bool)
    h, _, out_pc, _, _ = build_hierarchy(
        jax.random.fold_in(key, 1), pts, mask, jnp.ones((1, N, 3)), hcfg)
    radii = h.levels_radii
    L = len(spec.num_features)
    reqs = []
    for lvl in range(L):
        reqs.append((f"self{lvl}", lvl, h.levels[lvl],
                     spec.radius_scale_blocks * radii[lvl]))
    for lvl in range(L - 1):
        reqs.append((f"down{lvl}", lvl, h.levels[lvl + 1],
                     spec.radius_scale * radii[lvl]))
    for lvl in range(L - 1, 0, -1):
        reqs.append((f"up{lvl}", lvl, h.levels[lvl - 1],
                     spec.radius_scale_dec * radii[lvl]))
    for lvl in range(L - 1, 1, -1):
        reqs.append((f"fpn{lvl}", lvl, h.levels[0],
                     spec.radius_scale_dec * radii[lvl]))
    reqs.append(("seghead", 0, out_pc, spec.radius_scale * radii[0]))
    out = {}
    for name, src, dst_pc, radius in reqs:
        nb = ball_query_neighborhood(
            h.levels[src], dst_pc, radius, 32,
            cell_cap=spec.bq_cell_cap)
        cnt = jnp.sum(nb.mask, axis=2)  # [B, M]
        v = nb.query_mask
        nv = jnp.maximum(jnp.sum(v), 1)
        out[name] = (
            jnp.sum(jnp.where(v, cnt, 0)) / nv,               # mean
            jnp.sum((cnt >= 32) & v) / nv,                    # at cap 32
            jnp.sum((cnt >= 24) & v) / nv,
            jnp.sum((cnt >= 16) & v) / nv,
        )
    return out


if __name__ == "__main__":
    res = jax.device_get(stats(jax.random.PRNGKey(3)))
    for name, (mean, f32_, f24, f16) in res.items():
        print(f"{name:8s} mean {float(mean):5.1f}  >=32 {float(f32_):.3f}"
              f"  >=24 {float(f24):.3f}  >=16 {float(f16):.3f}", flush=True)
