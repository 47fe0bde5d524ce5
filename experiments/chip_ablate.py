"""Per-component cost breakdown of the fused conv step (on-device scan)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.core.neighborhoods import Neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.ops import pne_conv as ops
from se3conv3d_tpu.ops.pallas.fused_equiv import fused_pne_conv

B, M, K, F, Q, CI, CO = 1, 65536, 16, 2, 32, 64, 64
G, D = F, 9
S = 8
CDT = os.environ.get("CDT", "bfloat16")
TM = int(os.environ.get("TM", "64"))
PART = sys.argv[1]

def build(key):
    ks = jax.random.split(key, 7)
    return (jax.random.uniform(ks[0], (B, M, 3)) * 4.0,
            random_rotations(ks[1], B * M * F).reshape(B, M, F, 3, 3),
            jax.random.randint(ks[2], (B, M, K), 0, M),
            jax.random.normal(ks[3], (B, M, F, CI)),
            jax.random.normal(ks[4], (9, Q)) * 0.3,
            jax.random.normal(ks[5], (Q,)) * 0.02,
            jax.random.normal(ks[6], (CI, Q, CO)) * 0.05)

@jax.jit
def bench(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts, frames, idx, feats, pa, pb, w = build(key)
    pc = PointCloud(positions=pts, mask=jnp.ones((B, M), bool), frames=frames)
    neigh = Neighborhood(idx=idx, mask=jnp.ones((B, M, K), bool), query_mask=jnp.ones((B, M), bool))
    dt = jnp.dtype(CDT)
    feats_x = feats.astype(dt)

    if PART in ("kernel_fwd", "kernel_grad"):
        # pre-build geo2 + feat_g once (on-device), time kernel only
        # transposed packed layout [B, G*(D+1), M*K*F] the kernel expects
        rel_local, rot_feat = ops.equiv_geometry_parts(pc, pc, neigh, "6D")
        rel_s = jnp.broadcast_to((rel_local * 10.0)[:, :, :, None, :, :], (B, M, K, F, G, 3))
        rot_t = jnp.swapaxes(rot_feat, 3, 4)
        ones = jnp.ones((B, M, K, F, G, 1), jnp.float32)
        geo6 = jnp.concatenate([rel_s, rot_t, ones], -1)    # [B,M,K,F,G,D+1]
        geo2_full = geo6.reshape(B, M * K * F, G * (D + 1)).swapaxes(1, 2).astype(dt)
        feat_g = ops._gather_feats_me(feats_x, idx, neigh.mask)

    def step(c, _):
        if PART == "build_only":
            return c + jnp.sum(pts * (1 + 1e-12 * c)), ()
        if PART == "geometry":
            rl, rf = ops.equiv_geometry_parts(
                PointCloud(positions=pts * (1 + 1e-12 * c), mask=pc.mask, frames=frames), pc, neigh, "6D")
            return c + jnp.sum(rl) + jnp.sum(rf), ()
        if PART == "gather":
            fg = ops._gather_feats_me(feats_x * (1 + 1e-12 * c).astype(dt), idx, neigh.mask)
            return c + jnp.sum(fg.astype(jnp.float32)), ()
        if PART == "kernel_fwd":
            fg = feat_g * (1 + 1e-12 * c).astype(dt)
            out = fused_pne_conv(geo2_full, fg, pa, pb, w, g_frames=G, tile_m=TM, compute_dtype=CDT)
            return c + jnp.sum(out), ()
        if PART == "kernel_grad":
            def loss(fg_, pa_, pb_, w_):
                out = fused_pne_conv(geo2_full, fg_, pa_, pb_, w_, g_frames=G, tile_m=TM, compute_dtype=CDT)
                return jnp.sum(out * out)
            fg = feat_g * (1 + 1e-12 * c).astype(dt)
            v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(fg, pa, pb, w)
            return c + v + sum(jnp.sum(x.astype(jnp.float32)) for x in g), ()
        if PART == "scatter":
            def loss(f_):
                fg = ops._gather_feats_me(f_, idx, neigh.mask)
                return jnp.sum((fg * fg).astype(jnp.float32))
            v, g = jax.value_and_grad(loss)(feats_x * (1 + 1e-12 * c).astype(dt))
            return c + v + jnp.sum(g.astype(jnp.float32)), ()
        raise ValueError(PART)

    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c

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
print(f"{PART:12s}: {best/S*1e3:8.2f} ms/step (compile {tc:.0f}s)", flush=True)
