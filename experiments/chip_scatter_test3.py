"""Does index LOCALITY change scatter/gather cost on this TPU?

chip_scatter_test2 showed every reduction path is bound by ~25 ns/row on
1M row moves (permute-only bf16 = 21 ms for 256 MB = 12 GB/s, far under
the 43 GB/s roofline).  Production neighbor tables are spatially local
(grid-compacted clouds are in raster order; a query's neighbors sit
within a few hundred indices), while the bench uses uniform-random
targets.  If locality is the lever, the fix is (a) keep clouds
Morton/raster sorted and (b) make the bench workload locality-realistic.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

N = 65536
K = 16
FC = 128
E = N * K
S = 4

def bench(name, fn):
    s0 = int.from_bytes(os.urandom(4), "little") % (2**31)
    float(jax.device_get(fn(s0)))
    best = 1e9
    for _ in range(2):
        s1 = int.from_bytes(os.urandom(4), "little") % (2**31)
        t0 = time.perf_counter()
        float(jax.device_get(fn(s1)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best/S*1e3:8.2f} ms/step", flush=True)

def make_idx(key, local):
    """[E] targets: uniform-random, or query-local within a +-W window."""
    if local is None:
        return jax.random.randint(key, (E,), 0, N)
    m = jnp.repeat(jnp.arange(N), K)
    off = jax.random.randint(key, (E,), -local, local + 1)
    return jnp.clip(m + off, 0, N - 1)

def scatter_fn(local):
    @jax.jit
    def fn(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        k1, k2 = jax.random.split(key)
        g = jax.random.normal(k1, (E, FC)).astype(jnp.bfloat16)
        idx = make_idx(k2, local)
        def step(c, _):
            gp = (g * (1 + 1e-12 * c).astype(g.dtype)).astype(jnp.float32)
            out = jnp.zeros((N, FC), jnp.float32).at[idx].add(gp)
            return c + jnp.sum(out), ()
        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
        return c
    return fn

def gather_fn(local):
    """fwd-style row gather: table [N, FC], indices [E]."""
    @jax.jit
    def fn(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        k1, k2 = jax.random.split(key)
        tab = jax.random.normal(k1, (N, FC)).astype(jnp.bfloat16)
        idx = make_idx(k2, local)
        def step(c, _):
            tp = tab * (1 + 1e-12 * c).astype(tab.dtype)
            rows = jnp.take(tp, idx, axis=0)
            return c + jnp.sum(rows.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
        return c
    return fn

def permute_fn(local):
    """sorted-path permute: [E, FC] payload, perm = argsort of targets."""
    @jax.jit
    def fn(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        k1, k2 = jax.random.split(key)
        g = jax.random.normal(k1, (E, FC)).astype(jnp.bfloat16)
        perm = jnp.argsort(make_idx(k2, local))
        def step(c, _):
            gp = g * (1 + 1e-12 * c).astype(g.dtype)
            rows = jnp.take(gp, perm, axis=0)
            return c + jnp.sum(rows.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
        return c
    return fn

for local in (None, 4096, 256, 32):
    tag = "random" if local is None else f"local±{local}"
    bench(f"at_add f32 {tag}", scatter_fn(local))
for local in (None, 256):
    tag = "random" if local is None else f"local±{local}"
    bench(f"row-gather bf16 {tag}", gather_fn(local))
for local in (None, 256):
    tag = "random" if local is None else f"local±{local}"
    bench(f"permute bf16 {tag}", permute_fn(local))
