"""Scale M and time single-shot fwd+bwd of the production kernel."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.ops.pallas.fused_equiv import fused_pne_conv

B, E, G, D, Q, C, O = 1, 32, 2, 9, 32, 64, 64
cdt = sys.argv[2] if len(sys.argv) > 2 else None

def flops(m):
    edges = m * E * G
    return 3.0 * (2.0*edges*D*Q + 2.0*m*G*Q*C*E + 2.0*m*G*C*Q*O)

for M in [int(x) for x in sys.argv[1].split(",")]:
    seed = int.from_bytes(os.urandom(8), "little") % (2**31)
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    pa = jax.random.normal(ks[2], (D, Q)) * 0.3
    pb = jax.random.normal(ks[3], (Q,)) * 0.1
    w = jax.random.normal(ks[4], (C, Q, O)) * 0.1

    def loss(pa, pb, w, feat, geo2):
        out = fused_pne_conv(geo2, feat, pa, pb, w, g_frames=G, tile_m=int(os.environ.get("TM","64")), compute_dtype=cdt)
        return jnp.sum(out * out)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
    try:
        g_w = jax.random.normal(ks[0], (B, M * E, G * D))
        f_w = jax.random.normal(ks[1], (B, M, E, C))
        t0 = time.perf_counter()
        jax.block_until_ready(f(pa, pb, w, f_w, g_w))   # compile+warm
        tc = time.perf_counter() - t0
        # fresh inputs, single shot
        g_f = jax.random.normal(ks[5], (B, M * E, G * D))
        f_f = jax.random.normal(ks[6], (B, M, E, C))
        jax.block_until_ready((g_f, f_f))
        t0 = time.perf_counter()
        jax.block_until_ready(f(pa, pb, w, f_f, g_f))
        dt = time.perf_counter() - t0
        mfu = flops(M) / dt / 197e12
        print(f"M={M:6d}: {dt*1e3:8.2f} ms  {M/dt/1e6:7.2f} M pts/s  mfu {mfu:6.2%}  (compile {tc:.0f}s)", flush=True)
    except Exception as e:
        print(f"M={M:6d}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
