"""Clean timing: everything in one jit returning 2 scalars; fwd vs bwd."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.ops.pallas.fused_equiv import fused_pne_conv

B, E, G, D, Q, C, O = 1, 32, 2, 9, 32, 64, 64
M = int(os.environ.get("M", "65536"))
TM = int(os.environ.get("TM", "64"))
cdt = os.environ.get("CDT") or None

seed = int.from_bytes(os.urandom(8), "little") % (2**31)
ks = jax.random.split(jax.random.PRNGKey(seed), 3)
pa = jax.random.normal(ks[0], (D, Q)) * 0.3
pb = jax.random.normal(ks[1], (Q,)) * 0.1
w = jax.random.normal(ks[2], (C, Q, O)) * 0.1

def loss(pa, pb, w, feat, geo2):
    out = fused_pne_conv(geo2, feat, pa, pb, w, g_frames=G, tile_m=TM, compute_dtype=cdt)
    return jnp.sum(out * out)

@jax.jit
def run_fwd(pa, pb, w, feat, geo2):
    return loss(pa, pb, w, feat, geo2)

@jax.jit
def run_grad(pa, pb, w, feat, geo2):
    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(pa, pb, w, feat, geo2)
    return v + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

@jax.jit
def make(key):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, (B, M * E, G * D)),
            jax.random.normal(k2, (B, M, E, C)))

key = jax.random.PRNGKey(seed ^ 999)
flops_fwd = 2.0*M*E*G*D*Q + 2.0*M*G*Q*C*E + 2.0*M*G*C*Q*O
for name, fn, fl in (("fwd", run_fwd, flops_fwd), ("fwd+bwd", run_grad, 3*flops_fwd)):
    for i in range(4):
        key, sub = jax.random.split(key)
        g_i, f_i = make(sub)
        float(jax.device_get(jnp.sum(g_i[:, 0]) + jnp.sum(f_i[:, 0])))  # sync inputs
        t0 = time.perf_counter()
        v = float(jax.device_get(fn(pa, pb, w, f_i, g_i)))
        dt = time.perf_counter() - t0
        if i:  # skip compile shot
            print(f"{name:8s} shot {i}: {dt*1e3:8.2f} ms  {M/dt/1e6:7.2f} M pts/s  mfu {fl/dt/197e12:6.2%}", flush=True)
