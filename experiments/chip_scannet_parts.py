"""Per-part costs of the ScanNet-scale step (131k pts, K=32, F=G=1).

The bf16 A/B (chip_scannet_compile.py) showed ZERO step-time change vs
f32 -> the step is row-op-latency bound, not bandwidth bound.  This
breaks the step into its row-op phases to find where the 3.7 s goes.

Usage: PART=<name> [CH=64] [M=131072] python experiments/chip_scannet_parts.py
Parts: geo (packed geometry build), gather, scatter (gather fwd+bwd),
       kernel (fused kernel fwd with prebuilt inputs), kernel_grad,
       conv (full fused_equiv_conv fwd), conv_train (fwd+bwd),
       fpn_conv (131k queries from a small source level).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.core.neighborhoods import Neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.ops import pne_conv as ops

PART = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("PART", "conv")
B = 1
M = int(os.environ.get("M", "131072"))
N_SRC = int(os.environ.get("NSRC", str(M)))
K = int(os.environ.get("K", "32"))
F = G = 1
Q = 32
CH = int(os.environ.get("CH", "64"))
S = 4
CDT = os.environ.get("CDT") or None


@jax.jit
def bench(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    ks = jax.random.split(key, 7)
    pts = jax.random.uniform(ks[0], (B, N_SRC, 3)) * 8.0
    qpts = jax.random.uniform(ks[0], (B, M, 3)) * 8.0
    frames = random_rotations(ks[1], B * N_SRC * F).reshape(B, N_SRC, F, 3, 3)
    qframes = random_rotations(ks[1], B * M * G).reshape(B, M, G, 3, 3)
    idx = jax.random.randint(ks[2], (B, M, K), 0, N_SRC)
    feats = jax.random.normal(ks[3], (B, N_SRC, F, CH))
    pa = jax.random.normal(ks[4], (9, Q)) * 0.3
    pb = jax.random.normal(ks[5], (Q,)) * 0.02
    w = jax.random.normal(ks[6], (CH, Q, CH)) * 0.05
    src = PointCloud(positions=pts, mask=jnp.ones((B, N_SRC), bool), frames=frames)
    dst = PointCloud(positions=qpts, mask=jnp.ones((B, M), bool), frames=qframes)
    neigh = Neighborhood(idx=idx, mask=jnp.ones((B, M, K), bool),
                         query_mask=jnp.ones((B, M), bool))
    dt = jnp.dtype(CDT) if CDT else feats.dtype
    feats_x = feats.astype(dt)

    if PART in ("kernel", "kernel_grad"):
        geo_full = ops.packed_equiv_geometry(src, dst, neigh, CDT)
        feat_g0 = ops._gather_feats_me(feats_x, idx, neigh.mask)

    def step(c, _):
        eps = (1 + 1e-12 * c)
        if PART == "geo":
            g = ops.packed_equiv_geometry(
                PointCloud(positions=pts * eps, mask=src.mask, frames=frames),
                dst, neigh, CDT)
            return c + jnp.sum(g[:, :, :128].astype(jnp.float32)), ()
        if PART == "gather":
            fg = ops._gather_feats_me(feats_x * eps.astype(dt), idx, neigh.mask)
            return c + jnp.sum(fg.astype(jnp.float32)), ()
        if PART == "scatter":
            def loss(f_):
                fg = ops._gather_feats_me(f_, idx, neigh.mask)
                return jnp.sum((fg * fg).astype(jnp.float32))
            v, g = jax.value_and_grad(loss)(feats_x * eps.astype(dt))
            return c + v + jnp.sum(g.astype(jnp.float32)), ()
        if PART in ("kernel", "kernel_grad"):
            from se3conv3d_tpu.ops.pallas.fused_equiv import fused_pne_conv
            mc = ops.M_CHUNK_DEFAULT
            nch = M // mc
            geo_c = geo_full.reshape(B, G * 10, nch, mc * K * F)

            def one_chunk(i, acc):
                g_i = jax.lax.dynamic_slice_in_dim(geo_c, i, 1, 2)[:, :, 0]
                f_i = jax.lax.dynamic_slice_in_dim(feat_g0, i * mc, mc, 1)
                f_i = f_i * eps.astype(dt)
                if PART == "kernel":
                    out = fused_pne_conv(g_i, f_i, pa, pb, w, g_frames=G,
                                         compute_dtype=CDT)
                    return acc + jnp.sum(out)
                def loss(f_, pa_, pb_, w_):
                    out = fused_pne_conv(g_i, f_, pa_, pb_, w_, g_frames=G,
                                         compute_dtype=CDT)
                    return jnp.sum(out * out)
                v, gr = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                    f_i, pa, pb, w)
                return acc + v + sum(jnp.sum(x.astype(jnp.float32)) for x in gr)

            acc = jax.lax.fori_loop(0, nch, one_chunk, jnp.zeros(()))
            return c + acc, ()
        if PART == "conv" or PART == "fpn_conv":
            out = ops.fused_equiv_conv(
                src, dst, neigh, feats_x * eps.astype(dt), pa, pb, w,
                jnp.asarray(10.0), jnp.asarray(1.0 / K), compute_dtype=CDT)
            return c + jnp.sum(out.astype(jnp.float32)), ()
        if PART == "conv_train":
            def loss(f_, pa_, pb_, w_):
                out = ops.fused_equiv_conv(
                    src, dst, neigh, f_, pa_, pb_, w_,
                    jnp.asarray(10.0), jnp.asarray(1.0 / K),
                    compute_dtype=CDT)
                return jnp.sum((out * out).astype(jnp.float32))
            v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                feats_x * eps.astype(dt), pa, pb, w)
            return c + v + sum(jnp.sum(x.astype(jnp.float32)) for x in g), ()
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
print(f"{PART} M={M} NSRC={N_SRC} K={K} CH={CH} cdt={CDT}: "
      f"{best/S*1e3:8.2f} ms/step (compile {tc:.0f}s)", flush=True)
