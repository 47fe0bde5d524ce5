"""Which graph feature breaks Mosaic: scan, gather-diff, rng, geometry?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.core.neighborhoods import Neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.ops import pne_conv as ops

import os as _os
B, M, K, F, Q, CI, CO = 1, int(_os.environ.get("M","65536")), 16, 2, 32, 64, 64
TM = 64

def build(key):
    ks = jax.random.split(key, 7)
    pts = jax.random.uniform(ks[0], (B, M, 3)) * 4.0
    frames = random_rotations(ks[1], B * M * F).reshape(B, M, F, 3, 3)
    idx = jax.random.randint(ks[2], (B, M, K), 0, M)
    feats = jax.random.normal(ks[3], (B, M, F, CI))
    pa = jax.random.normal(ks[4], (9, Q)) * 0.3
    pb = jax.random.normal(ks[5], (Q,)) * 0.02
    w = jax.random.normal(ks[6], (CI, Q, CO)) * 0.05
    return pts, frames, idx, feats, pa, pb, w

def loss(feats, pts, frames, idx, pa, pb, w):
    pc = PointCloud(positions=pts, mask=jnp.ones((B, M), bool), frames=frames)
    neigh = Neighborhood(idx=idx, mask=jnp.ones((B, M, K), bool), query_mask=jnp.ones((B, M), bool))
    out = ops.fused_equiv_conv(pc, pc, neigh, feats, pa, pb, w, jnp.asarray(10.0), jnp.asarray(1.0/K), tile_m=TM)
    return jnp.sum(out * out)

def trial(name, fn):
    try:
        s = int.from_bytes(os.urandom(4), "little") % (2**31)
        float(jax.device_get(fn(s)))
        print(f"PASS {name}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:90]}", flush=True)

@jax.jit
def t1(seed):  # no scan, grads to params only (not feats)
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts, frames, idx, feats, pa, pb, w = build(key)
    v, g = jax.value_and_grad(loss, argnums=(4, 5, 6))(feats, pts, frames, idx, pa, pb, w)
    return v + sum(jnp.sum(x) for x in g)

@jax.jit
def t2(seed):  # no scan, grads incl feats (gather-diff)
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts, frames, idx, feats, pa, pb, w = build(key)
    v, g = jax.value_and_grad(loss, argnums=(0, 4, 5, 6))(feats, pts, frames, idx, pa, pb, w)
    return v + sum(jnp.sum(x) for x in g)

@jax.jit
def t3(seed):  # scan S=2, grads to params only
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts, frames, idx, feats, pa, pb, w = build(key)
    def step(c, _):
        v, g = jax.value_and_grad(loss, argnums=(4, 5, 6))(feats * (1 + 1e-12 * c), pts, frames, idx, pa, pb, w)
        return c + v + sum(jnp.sum(x) for x in g), ()
    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=2)
    return c

trial("t1_nograd_feats", t1)
trial("t2_grad_feats", t2)
trial("t3_scan_paramgrads", t3)
