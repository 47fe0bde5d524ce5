"""Smoke: production fused_pne_conv on the real chip, small shapes.

Health probe for the fused conv path — run on-chip before trusting any
bigger measurement.  Geometry uses the CURRENT packed-transposed layout
``geo_t [B, G*(D+1), M*E]`` with each g-block's last row all-ones (the
bias row) — see ``ops/pallas/fused_equiv.py``.  Modes: ``fwd`` /
``fwd_bf16`` / ``bwd`` / ``bwd_bf16``.  Shapes shrink via the ``SMOKE_M``
env var so ``tests/test_chip_smoke_lowering.py`` can run this exact
script on the CPU backend (interpret-mode Pallas) and catch API rot
without a chip.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

# sitecustomize pre-imports jax, so JAX_PLATFORMS alone may not stick —
# apply it explicitly (unset on-chip -> the real backend)
_p = os.environ.get("JAX_PLATFORMS")
if _p:
    jax.config.update("jax_platforms", _p)

from se3conv3d_tpu.ops.pallas.fused_equiv import fused_pne_conv

B, M, E, G, D, Q, C, O = 1, int(os.environ.get("SMOKE_M", "1024")), 32, 2, 9, 32, 64, 64
seed = int.from_bytes(os.urandom(8), "little") % (2**31)
ks = jax.random.split(jax.random.PRNGKey(seed), 5)
# packed geometry: [B, G, D, M*E] random rows + per-g ones row -> [B, G*(D+1), M*E]
geo_core = jax.random.normal(ks[0], (B, G, D, M * E))
geo_t = jnp.concatenate(
    [geo_core, jnp.ones((B, G, 1, M * E))], axis=2
).reshape(B, G * (D + 1), M * E)
feat = jax.random.normal(ks[1], (B, M, E, C))
pa = jax.random.normal(ks[2], (D, Q)) * 0.3
pb = jax.random.normal(ks[3], (Q,)) * 0.1
w = jax.random.normal(ks[4], (C, Q, O)) * 0.1

mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
cdt = "bfloat16" if "bf16" in mode else None

def loss(pa, pb, w, feat):
    out = fused_pne_conv(geo_t, feat, pa, pb, w, g_frames=G, compute_dtype=cdt)
    return jnp.sum(out * out)

t0 = time.perf_counter()
if mode.startswith("fwd"):
    v = jax.block_until_ready(jax.jit(loss)(pa, pb, w, feat))
    print(f"fwd ok loss={float(v):.3f}  {time.perf_counter()-t0:.1f}s")
else:
    v, g = jax.block_until_ready(jax.jit(jax.value_and_grad(loss, argnums=(0,1,2,3)))(pa, pb, w, feat))
    print(f"fwd+bwd ok loss={float(v):.3f} |gpa|={float(jnp.abs(g[0]).sum()):.3f}  {time.perf_counter()-t0:.1f}s")
