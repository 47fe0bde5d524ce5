"""Which kernel (fwd or bwd) fails at which M?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.ops.pallas.fused_equiv import fused_pne_conv

B, E, G, D, Q, C, O = 1, 32, 2, 9, 32, 64, 64

for M in [int(x) for x in sys.argv[1].split(",")]:
    for mode in ("fwd", "grad"):
        seed = int.from_bytes(os.urandom(8), "little") % (2**31)
        ks = jax.random.split(jax.random.PRNGKey(seed), 7)
        pa = jax.random.normal(ks[2], (D, Q)) * 0.3
        pb = jax.random.normal(ks[3], (Q,)) * 0.1
        w = jax.random.normal(ks[4], (C, Q, O)) * 0.1
        g_w = jax.random.normal(ks[0], (B, G * (D + 1), M * E))
        f_w = jax.random.normal(ks[1], (B, M, E, C))

        def loss(pa, pb, w, feat):
            out = fused_pne_conv(g_w, feat, pa, pb, w, g_frames=G)
            return jnp.sum(out * out)

        f = jax.jit(loss) if mode == "fwd" else jax.jit(jax.grad(loss, argnums=(0,1,2,3)))
        try:
            jax.block_until_ready(f(pa, pb, w, f_w))
            print(f"M={M:6d} {mode:4s}: OK", flush=True)
        except Exception as e:
            print(f"M={M:6d} {mode:4s}: FAILED {str(e)[:120]}", flush=True)
