"""Grid BQ sub-part costs at 131k."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from se3conv3d_tpu.core import neighborhoods as nh

N, K, R = 131072, 32, 0.2
S = 4
H = max(1 << (N - 1).bit_length(), 1024)
PART = sys.argv[1]

@jax.jit
def bench(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    pts = jax.random.uniform(key, (N, 3)) * 8.0
    mask = jnp.ones((N,), bool)

    def step(c, _):
        p = pts * (1 + 1e-12 * c)
        big = jnp.asarray(jnp.finfo(p.dtype).max, p.dtype)
        origin = jnp.min(jnp.where(mask[:, None], p, big), axis=0) - 1e-6
        top = jnp.max(jnp.where(mask[:, None], p, -big), axis=0) + 1e-6
        dims = jnp.maximum(((top - origin) / R).astype(jnp.int32) + 1, 1)
        if PART == "argsort":
            cell = jnp.floor((p - origin) / R).astype(jnp.int32)
            h = nh._cell_hash(cell, dims, H)
            order = jnp.argsort(h, stable=True)
            return c + jnp.sum(order[:8]), ()
        tab = nh._build_cell_table(p, mask, origin, dims, R, H, 32)
        if PART == "build":
            return c + jnp.sum(tab[:4]), ()
        import os as _os
        ck = int(_os.environ.get('CK', '4096'))
        idx, ok, d2 = nh._grid_topk_neighbors(p, mask, p, mask, K, R * R, R, 3, H, 32, chunk=ck)
        return c + jnp.sum(idx) + jnp.sum(ok), ()

    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c

s0 = int.from_bytes(os.urandom(4), "little") % (2**31)
float(jax.device_get(bench(s0)))
best = 1e9
for _ in range(2):
    s1 = int.from_bytes(os.urandom(4), "little") % (2**31)
    t0 = time.perf_counter(); float(jax.device_get(bench(s1)))
    best = min(best, time.perf_counter() - t0)
print(f"{PART}: {best/S*1e3:.1f} ms", flush=True)
