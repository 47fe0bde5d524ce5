"""Careful timing: repeated fresh-input single shots, device_get forced."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.ops.pallas.fused_equiv import fused_pne_conv

B, E, G, D, Q, C, O = 1, 32, 2, 9, 32, 64, 64
M = 65536
TM = int(os.environ.get("TM", "64"))
cdt = sys.argv[1] if len(sys.argv) > 1 else None

seed = int.from_bytes(os.urandom(8), "little") % (2**31)
ks = jax.random.split(jax.random.PRNGKey(seed), 3)
pa = jax.random.normal(ks[0], (D, Q)) * 0.3
pb = jax.random.normal(ks[1], (Q,)) * 0.1
w = jax.random.normal(ks[2], (C, Q, O)) * 0.1

def loss(pa, pb, w, feat, geo2):
    out = fused_pne_conv(geo2, feat, pa, pb, w, g_frames=G, tile_m=TM, compute_dtype=cdt)
    return jnp.sum(out * out)

f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))

@jax.jit
def make(key):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, (B, M * E, G * D)),
            jax.random.normal(k2, (B, M, E, C)))

key = jax.random.PRNGKey(seed ^ 12345)
flops = 3.0 * (2.0*M*E*G*D*Q + 2.0*M*G*Q*C*E + 2.0*M*G*C*Q*O)
for i in range(6):
    key, sub = jax.random.split(key)
    g_i, f_i = jax.block_until_ready(make(sub))
    t0 = time.perf_counter()
    v, grads = f(pa, pb, w, f_i, g_i)
    lv = float(jax.device_get(v))
    gsum = float(jax.device_get(jnp.sum(grads[0])))
    dt = time.perf_counter() - t0
    print(f"shot {i}: {dt*1e3:8.2f} ms  {M/dt/1e6:7.2f} M pts/s  mfu {flops/dt/197e12:6.2%}  loss={lv:.1f} g={gsum:.2f}", flush=True)
