"""Are arrays device-resident? What does a big matmul achieve?"""
import os, time
import jax, jax.numpy as jnp

seed = int.from_bytes(os.urandom(8), "little") % (2**31)
key = jax.random.PRNGKey(seed)

# 1) repeat-sum on the same 537MB array
x = jax.block_until_ready(jax.random.normal(key, (65536, 32, 64)))
nb = x.size * 4
f = jax.jit(lambda a: jnp.sum(a * 1.000001))
for i in range(4):
    t0 = time.perf_counter()
    float(jax.device_get(f(x)))
    dt = time.perf_counter() - t0
    print(f"sum same-array rep{i}: {dt*1e3:7.2f} ms {nb/dt/1e9:6.1f} GB/s", flush=True)

# 2) chained on-device: out of jit stays as jax.Array
g = jax.jit(lambda a: a * 1.000001)
y = g(x)
jax.block_until_ready(y)
t0 = time.perf_counter()
y2 = g(y)
float(jax.device_get(jnp.sum(y2[:1])))
print(f"chained elementwise:   {(time.perf_counter()-t0)*1e3:7.2f} ms", flush=True)

# 3) big matmul flops (fresh operands, single shot)
k1, k2, k3, k4 = jax.random.split(key, 4)
n = 8192
mm = jax.jit(lambda a, b: jnp.sum(jnp.dot(a, b, preferred_element_type=jnp.float32)[:, :8]))
for dt_ in (jnp.bfloat16, jnp.float32):
    a = jax.block_until_ready(jax.random.normal(k1, (n, n)).astype(dt_))
    b = jax.block_until_ready(jax.random.normal(k2, (n, n)).astype(dt_))
    float(jax.device_get(mm(a, b)))  # warm
    a2 = jax.block_until_ready(jax.random.normal(k3, (n, n)).astype(dt_))
    b2 = jax.block_until_ready(jax.random.normal(k4, (n, n)).astype(dt_))
    t0 = time.perf_counter()
    float(jax.device_get(mm(a2, b2)))
    dt = time.perf_counter() - t0
    fl = 2.0 * n * n * n
    print(f"matmul {n}^3 {dt_.__name__}: {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TFLOP/s", flush=True)
