"""Pure streaming rate of pallas vs XLA on the same arrays."""
import os, sys, time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 65536
TM = int(os.environ.get("TM", "64"))
E, C = 32, 64
GD1 = 19

def timed(name, fn, *args, nbytes=0):
    for i in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(fn(*args)))
        dt = time.perf_counter() - t0
        if i == 2:
            print(f"{name:24s} {dt*1e3:8.2f} ms  {nbytes/dt/1e9:7.1f} GB/s", flush=True)

seed = int.from_bytes(os.urandom(8), "little") % (2**31)
k = jax.random.split(jax.random.PRNGKey(seed), 3)
feat = jax.block_until_ready(jax.random.normal(k[0], (M, E, C)))
geo = jax.block_until_ready(jax.random.normal(k[1], (M * E, GD1)))
geo128 = jax.block_until_ready(jax.random.normal(k[2], (M * E, 128)))

@jax.jit
def xla_sum_feat(x):
    return jnp.sum(x * 1.000001)

def k_sum(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += jnp.sum(x_ref[:], axis=tuple(range(x_ref.ndim - 1)), keepdims=x_ref.ndim == 2)[-1:]

def pallas_sum_feat(x):
    return jnp.sum(pl.pallas_call(
        k_sum, grid=(M // TM,),
        in_specs=[pl.BlockSpec((TM, E, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
    )(x))

def pallas_sum_geo(x, lanes):
    return jnp.sum(pl.pallas_call(
        k_sum, grid=(M // TM,),
        in_specs=[pl.BlockSpec((TM * E, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, lanes), jnp.float32),
    )(x))

fb = M * E * C * 4
gb = M * E * GD1 * 4
g128b = M * E * 128 * 4
timed("xla sum feat", jax.jit(xla_sum_feat), feat, nbytes=fb)
timed("xla sum geo19", jax.jit(xla_sum_feat), geo, nbytes=gb)
timed("pallas sum feat", jax.jit(pallas_sum_feat), feat, nbytes=fb)
timed("pallas sum geo19", jax.jit(functools.partial(pallas_sum_geo, lanes=GD1)), geo, nbytes=gb)
timed("pallas sum geo128", jax.jit(functools.partial(pallas_sum_geo, lanes=128)), geo128, nbytes=g128b)
