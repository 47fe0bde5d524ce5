"""m_chunk sweep for the fused conv at bench shapes.

The full bench (N=65536, m_chunk=16384) runs 4 chunk steps per conv
under lax.scan; the mini bench (16384, single call) shows ~10% higher
per-point throughput, so the chunk scan carries overhead.  The platform
compile helper fails past ~48k queries per kernel call, so 32768 is the
only candidate above the default.

Usage: MC=32768 [LEAN=0|1] python experiments/chip_mchunk.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

from se3conv3d_tpu.core.neighborhoods import Neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.ops import pne_conv as ops

B, N, K, F, CB, C = 1, 65536, 16, 2, 32, 64
S = 8
LAYERS = 2
MC = int(os.environ.get("MC", "32768"))
LEAN = os.environ.get("LEAN", "0") != "0"


def build(key):
    ks = jax.random.split(key, 7)
    pts = jax.random.uniform(ks[0], (B, N, 3)) * 4.0
    frames = random_rotations(ks[1], B * N * F).reshape(B, N, F, 3, 3)
    idx = jax.random.randint(ks[2], (B, N, K), 0, N)
    feats = jax.random.normal(ks[3], (B, N, F, C))
    pa = jax.random.normal(ks[4], (9, CB)) * 0.3
    pb = jax.random.normal(ks[5], (CB,)) * 0.02
    w = jax.random.normal(ks[6], (C, CB, C)) * 0.05
    return pts, frames, idx, feats, pa, pb, w


def loss(feats, pts, frames, idx, pa, pb, w):
    pc = PointCloud(positions=pts, mask=jnp.ones((B, N), bool), frames=frames)
    neigh = Neighborhood(
        idx=idx, mask=jnp.ones((B, N, K), bool),
        query_mask=jnp.ones((B, N), bool),
    )
    geo_t = ops.packed_equiv_geometry(pc, pc, neigh, "bfloat16")
    neigh = neigh.replace(equiv_geo_t=geo_t)
    x = feats
    total = jnp.zeros(())
    for _ in range(LAYERS):
        x = ops.fused_equiv_conv(
            pc, pc, neigh, x, pa, pb, w, jnp.asarray(10.0),
            jnp.asarray(1.0 / K), compute_dtype="bfloat16",
            m_chunk=MC, lean_vjp=LEAN,
        )
        total = total + jnp.sum(x * x)
    return total


vg = jax.value_and_grad(loss, argnums=(0, 4, 5, 6))


@jax.jit
def bench(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts, frames, idx, feats, pa, pb, w = build(key)

    def step(carry, _):
        f_i = feats * (1.0 + 1e-12 * carry)
        v, grads = vg(f_i, pts, frames, idx, pa, pb, w)
        gs = sum(jnp.sum(g.astype(jnp.float32)) for g in grads)
        return carry + v + gs, ()

    carry, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return carry


def fresh():
    return int.from_bytes(os.urandom(4), "little") % (2**31)


t0 = time.time()
float(jax.device_get(bench(fresh())))
print(f"compile+warm {time.time()-t0:.1f} s", flush=True)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    float(jax.device_get(bench(fresh())))
    times.append(time.perf_counter() - t0)
sec = min(times) / (S * LAYERS)
print(
    f"MC={MC} LEAN={int(LEAN)}: {sec*1e3:.2f} ms/conv, "
    f"{B*N/sec/1e6:.3f} M pts/s  (runs {[f'{t:.3f}' for t in times]})"
)
