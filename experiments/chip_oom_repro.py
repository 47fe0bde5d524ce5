"""Reproduce the decoder-conv VMEM OOM seen in the r3 train-step compile.

MULTICHIP-era failure (r3 measure sweep, PART=train): the ScanNet train
step stopped compiling with "Ran out of memory in memory space vmem while
allocating on stack for ... f32[2,1,16384,1,128] ... pallas_call" at
fpn_decoder/decoder/conv_2 — the double-buffered per-chunk kernel output
(m_chunk=16384, Co=128) placed in scoped VMEM.  The same shapes compiled
at the 3.06 s step measurement, so a session-C/D change flipped an XLA
fusion decision.  This isolates just that conv: an UNCACHED neighborhood
(merged gather path) at m=32768, C=O=128, fwd+bwd, under the same
lax.scan chunking.

Usage: [MERGE=0] [M=32768] [C=128] python experiments/chip_oom_repro.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("MERGE"):
    os.environ["SE3CONV_MERGE_GATHER"] = os.environ["MERGE"]
import jax, jax.numpy as jnp

from se3conv3d_tpu.core.neighborhoods import Neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.ops.pne_conv import fused_equiv_conv

M = int(os.environ.get("M", "32768"))
N = 8192
K = 16
C = int(os.environ.get("C", "128"))
O = C
Q = 32


@jax.jit
def run(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    ks = jax.random.split(key, 8)
    pin = PointCloud(
        positions=jax.random.uniform(ks[0], (1, N, 3)) * 8.0,
        mask=jnp.ones((1, N), bool),
        frames=jnp.broadcast_to(jnp.eye(3), (1, N, 1, 3, 3)),
    )
    pout = PointCloud(
        positions=jax.random.uniform(ks[1], (1, M, 3)) * 8.0,
        mask=jnp.ones((1, M), bool),
        frames=jnp.broadcast_to(jnp.eye(3), (1, M, 1, 3, 3)),
    )
    neigh = Neighborhood(
        idx=jax.random.randint(ks[2], (1, M, K), 0, N),
        mask=jnp.ones((1, M, K), bool),
        query_mask=pout.mask,
    )
    feats = jax.random.normal(ks[3], (1, N, 1, C))
    pa = jax.random.normal(ks[4], (9, Q)) * 0.1
    pb = jnp.zeros((Q,))
    w = jax.random.normal(ks[5], (C, Q, O)) * 0.05

    def loss(params):
        pa_, w_ = params
        out = fused_equiv_conv(
            pin, pout, neigh, feats, pa_, pb, w_,
            jnp.ones(()), jnp.ones(()),
        )
        return jnp.sum(out * out)

    g = jax.grad(loss)((pa, w))
    return jnp.sum(g[0]) + jnp.sum(g[1])


if __name__ == "__main__":
    t = time.time()
    v = float(jax.device_get(run(0)))
    print(f"ok merge={os.environ.get('MERGE', '1')} C={C} M={M} "
          f"val={v:.3e} wall={time.time()-t:.0f}s")
