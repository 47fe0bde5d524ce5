"""Round-3 follow-up scatter candidates (see chip_scatter_test.py).

Today's chip: at_add f32 29.9 ms, sorted-pallas-cumsum(block=256) 35.7 ms.
The cumsum grid is 4096 sequential steps at block=256 — likely grid-step
overhead, not bandwidth.  Isolate the permute cost and sweep the cumsum
block size; also try segment_sum / at_add on pre-sorted payloads.
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

def make(key, dt):
    k1, k2 = jax.random.split(key)
    g = jax.random.normal(k1, (E, FC)).astype(dt)
    idx = jax.random.randint(k2, (E,), 0, N)
    return g, idx

def with_tables(body, dt=jnp.bfloat16):
    """Sort tables built outside the scan (per-neighborhood cache)."""
    @jax.jit
    def fn(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        g, idx = make(key, dt)
        order = jnp.argsort(idx)
        ids_sorted = jnp.take(idx, order)
        targets = jnp.arange(N)
        rs = jnp.searchsorted(ids_sorted, targets, side="left").astype(jnp.int32)
        re = jnp.searchsorted(ids_sorted, targets, side="right").astype(jnp.int32)
        def step(c, _):
            gp = g * (1 + 1e-12 * c).astype(g.dtype)
            out = body(gp, order, ids_sorted, rs, re)
            return c + jnp.sum(out.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
        return c
    return fn

# 7) permute-gather only — the sorted path's floor component
bench("permute-only bf16", with_tables(
    lambda g, order, ids, rs, re: jnp.take(g, order, axis=0)))

# 8) sorted pallas cumsum, block sweep
def sorted_block(block):
    from se3conv3d_tpu.ops.pallas.segsum import sorted_segment_sum
    def body(g, order, ids, rs, re):
        srt = jnp.take(g, order, axis=0)
        return sorted_segment_sum(srt, rs, re, block=block)
    return body

for blk in (512, 1024, 2048):
    bench(f"sorted pallas cumsum b={blk}", with_tables(sorted_block(blk)))

# 9) XLA segment_sum on pre-sorted payload
def seg_sorted(g, order, ids, rs, re):
    srt = jnp.take(g, order, axis=0).astype(jnp.float32)
    return jax.ops.segment_sum(srt, ids, num_segments=N, indices_are_sorted=True)
bench("presorted segment_sum", with_tables(seg_sorted))

# 10) at_add on pre-sorted payload (does XLA exploit sortedness?)
def at_add_sorted(g, order, ids, rs, re):
    srt = jnp.take(g, order, axis=0).astype(jnp.float32)
    return jnp.zeros((N, FC), jnp.float32).at[ids].add(srt)
bench("presorted at_add", with_tables(at_add_sorted))
