import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.core.neighborhoods import Neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.ops import pne_conv as ops

import os as _os
B, M, K, F, Q, CI, CO = 1, int(_os.environ.get("MM","65536")), 16, 2, 32, 64, 64

def build(key):
    ks = jax.random.split(key, 7)
    return (jax.random.uniform(ks[0], (B, M, 3)) * 4.0,
            random_rotations(ks[1], B * M * F).reshape(B, M, F, 3, 3),
            jax.random.randint(ks[2], (B, M, K), 0, M),
            jax.random.normal(ks[3], (B, M, F, CI)),
            jax.random.normal(ks[4], (9, Q)) * 0.3,
            jax.random.normal(ks[5], (Q,)) * 0.02,
            jax.random.normal(ks[6], (CI, Q, CO)) * 0.05)

def loss(feats, pts, frames, idx, pa, pb, w):
    pc = PointCloud(positions=pts, mask=jnp.ones((B, M), bool), frames=frames)
    neigh = Neighborhood(idx=idx, mask=jnp.ones((B, M, K), bool), query_mask=jnp.ones((B, M), bool))
    out = ops.fused_equiv_conv(pc, pc, neigh, feats, pa, pb, w, jnp.asarray(10.0), jnp.asarray(1.0/K), tile_m=64)
    return jnp.sum(out * out)

@jax.jit
def t2(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts, frames, idx, feats, pa, pb, w = build(key)
    v, g = jax.value_and_grad(loss, argnums=(0, 4, 5, 6))(feats, pts, frames, idx, pa, pb, w)
    return v + sum(jnp.sum(x) for x in g)

for attempt in range(1):
    try:
        s = int.from_bytes(os.urandom(4), "little") % (2**31)
        float(jax.device_get(t2(s)))
        print(f"attempt {attempt}: PASS", flush=True)
        break
    except Exception as e:
        print(f"attempt {attempt}: FAIL {str(e)[:80]}", flush=True)
        jax.clear_caches()
