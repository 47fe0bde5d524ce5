"""Cost of scalar vs row gathers on this TPU."""
import os, time
import jax, jax.numpy as jnp

B, N, M, K, F = 1, 65536, 65536, 16, 2
S = 8

def bench(name, fn):
    s0 = int.from_bytes(os.urandom(4), "little") % (2**31)
    float(jax.device_get(fn(s0)))
    s1 = int.from_bytes(os.urandom(4), "little") % (2**31)
    t0 = time.perf_counter()
    float(jax.device_get(fn(s1)))
    print(f"{name:30s} {(time.perf_counter()-t0)/S*1e3:8.2f} ms/step", flush=True)

@jax.jit
def scalar_gather9(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    k1, k2 = jax.random.split(key)
    tab = jax.random.normal(k1, (B, N * F, 3, 3))
    idx2 = jax.random.randint(k2, (B, M * K * F), 0, N * F)
    def step(c, _):
        i = idx2 + (c.astype(jnp.int32) % 2)
        out = sum(jnp.sum(jnp.take_along_axis(tab[..., d, q], i, axis=1))
                  for d in range(3) for q in range(3))
        return c + out, ()
    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c

@jax.jit
def row_gather18(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    k1, k2 = jax.random.split(key)
    tab = jax.random.normal(k1, (B, N, 18))
    idx = jax.random.randint(k2, (B, M * K), 0, N)
    def step(c, _):
        i = idx + (c.astype(jnp.int32) % 2)
        g = jax.vmap(lambda t, ii: t[ii])(tab, i)
        return c + jnp.sum(g), ()
    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c

@jax.jit
def scalar_gather1(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    k1, k2 = jax.random.split(key)
    tab = jax.random.normal(k1, (B, N * F))
    idx2 = jax.random.randint(k2, (B, M * K * F), 0, N * F)
    def step(c, _):
        i = idx2 + (c.astype(jnp.int32) % 2)
        return c + jnp.sum(jnp.take_along_axis(tab, i, axis=1)), ()
    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c

bench("scalar gather x1 (2M elems)", scalar_gather1)
bench("scalar gather x9 (2M elems)", scalar_gather9)
bench("row gather 18 (1M rows)", row_gather18)
