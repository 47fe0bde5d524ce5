"""True on-device roofline: HBM read bandwidth and matmul TFLOP/s.

Everything generated on-device inside one jit; scan with carry dependency
so steps can't be elided/cached; only a scalar leaves the device.
"""
import os, time
import jax, jax.numpy as jnp

S = 8

def timeit(name, fn, work_per_step, unit):
    seed = int.from_bytes(os.urandom(4), "little") % (2**31)
    float(jax.device_get(fn(seed)))  # compile+warm
    seed2 = int.from_bytes(os.urandom(4), "little") % (2**31)
    t0 = time.perf_counter()
    float(jax.device_get(fn(seed2)))
    dt = (time.perf_counter() - t0) / S
    print(f"{name:28s} {dt*1e3:8.2f} ms/step  {work_per_step/dt/1e9:8.1f} G{unit}/s", flush=True)

# 1) HBM read bandwidth: sum of a 537MB array, perturbed per step
N = 134_217_728  # f32 -> 537MB

@jax.jit
def bw(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    x = jax.random.normal(key, (N // 1024, 1024))
    def step(c, _):
        return c + jnp.sum(x * (1.0 + 1e-30 * c)), ()
    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c

timeit("hbm read 537MB f32", bw, N * 4, "B")

# 2) matmul peak bf16: 8192^3 per step
n = 8192

@jax.jit
def mm(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(1), seed)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (n, n)).astype(jnp.bfloat16)
    b = jax.random.normal(k2, (n, n)).astype(jnp.bfloat16)
    def step(c, _):
        a2 = a * (1.0 + 1e-8 * c).astype(jnp.bfloat16)
        p = jnp.dot(a2, b, preferred_element_type=jnp.float32)
        return c + p[0, 0] + p[-1, -1], ()
    c, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=S)
    return c

timeit("matmul 8192^3 bf16", mm, 2.0 * n**3, "FLOP")

# 3) gather bandwidth: 1M random rows of [64] from a [1M, 64] table
M = 1_048_576

@jax.jit
def ga(seed):
    key = jax.random.fold_in(jax.random.PRNGKey(2), seed)
    k1, k2 = jax.random.split(key)
    tab = jax.random.normal(k1, (M, 64))
    idx = jax.random.randint(k2, (M,), 0, M)
    def step(c, _):
        g = tab[idx] * (1.0 + 1e-30 * c)
        return c + jnp.sum(g), ()
    c, _ = jax.lax.scan(step, jnp.zeros(()), None, length=S)
    return c

timeit("gather 1M x 64 f32", ga, M * 64 * 4, "B")
