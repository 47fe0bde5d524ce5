"""top_k vs approx_max_k over [131072, 864] -> 32 on this TPU."""
import os, time
import jax, jax.numpy as jnp

M, C, K = 131072, 864, 32
S = 4

def bench(name, sel):
    @jax.jit
    def run(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        x = jax.random.normal(key, (M, C))
        def step(c, _):
            v, i = sel(x * (1 + 1e-12 * c))
            return c + jnp.sum(v) + jnp.sum(i), ()
        c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
        return c
    s0 = int.from_bytes(os.urandom(4), "little") % (2**31)
    float(jax.device_get(run(s0)))
    best = 1e9
    for _ in range(2):
        s1 = int.from_bytes(os.urandom(4), "little") % (2**31)
        t0 = time.perf_counter(); float(jax.device_get(run(s1)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best/S*1e3:8.1f} ms", flush=True)

bench("lax.top_k", lambda x: jax.lax.top_k(x, K))
bench("approx_max_k r=0.99", lambda x: jax.lax.approx_max_k(x, K, recall_target=0.99))
bench("approx_max_k r=0.95", lambda x: jax.lax.approx_max_k(x, K, recall_target=0.95))
# exact two-stage: per-group top-k? compare a sort
bench("full sort", lambda x: (jnp.sort(x, axis=1)[:, -K:], jnp.argsort(x, axis=1)[:, -K:]))
