"""Does revisited-output accumulation fail at larger grids?"""
import os, sys, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM, E, G, D, Q, C, O = 128, 32, 2, 9, 32, 64, 64
GD, GQ = G * D, G * Q

def trial(name, grid_n, n_accum, with_dfeat):
    M = TM * grid_n
    key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
    a = jax.random.normal(key, (M, E, C))

    def k(a_ref, *refs):
        outs = list(refs)
        x = a_ref[:]
        if with_dfeat:
            outs[0][:] = x * 2.0
            outs = outs[1:]
        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in outs:
                r[:] = jnp.zeros_like(r)
        red = jnp.sum(x, axis=0)  # [E, C]
        for r in outs:
            if r.shape == (GD, GQ):
                r[:] += jnp.sum(red) * jnp.ones((GD, GQ), jnp.float32)
            elif r.shape == (1, GQ):
                r[:] += jnp.sum(red) * jnp.ones((1, GQ), jnp.float32)
            else:
                r[:] += jnp.broadcast_to(red[None, :GQ // Q * Q][:, :1, :1], r.shape) * 0 + jnp.sum(red)

    out_specs, out_shape = [], []
    if with_dfeat:
        out_specs.append(pl.BlockSpec((TM, E, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((M, E, C), jnp.float32))
    shapes = [(GD, GQ), (1, GQ), (GQ, C, O)][:n_accum]
    for s in shapes:
        if len(s) == 2:
            out_specs.append(pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM))
        else:
            out_specs.append(pl.BlockSpec(s, lambda i: (0, 0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(s, jnp.float32))

    f = pl.pallas_call(k, grid=(grid_n,), in_specs=[pl.BlockSpec((TM, E, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)], out_specs=out_specs, out_shape=out_shape)
    try:
        jax.block_until_ready(jax.jit(f)(a))
        print(f"PASS {name}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:100]}", flush=True)

for gn in (16, 32, 64):
    trial(f"grid{gn}_accum3_dfeat", gn, 3, True)
for gn in (32,):
    trial(f"grid{gn}_accum3_nodfeat", gn, 3, False)
    trial(f"grid{gn}_accum1_dfeat", gn, 1, True)
    trial(f"grid{gn}_accum0_dfeat", gn, 0, True)
