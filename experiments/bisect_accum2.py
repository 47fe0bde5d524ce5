"""Which accumulator output combination fails?"""
import os, sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM, E, G, D, Q, C, O = 128, 32, 2, 9, 32, 64, 64
GD, GQ = G * D, G * Q
SHAPES = {"dproj": (GD, GQ), "dbias": (1, GQ), "dw2": (GQ, C, O)}

def trial(names, grid_n=32, with_dfeat=True):
    M = TM * grid_n
    key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
    a = jax.random.normal(key, (M, E, C))
    shapes = [SHAPES[n] for n in names]

    def k(a_ref, *refs):
        refs = list(refs)
        x = a_ref[:]
        if with_dfeat:
            refs[0][:] = x * 2.0
            refs = refs[1:]
        s = jnp.sum(x)
        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in refs:
                r[:] = jnp.zeros_like(r)
        for r in refs:
            r[:] += s

    out_specs, out_shape = [], []
    if with_dfeat:
        out_specs.append(pl.BlockSpec((TM, E, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((M, E, C), jnp.float32))
    for s in shapes:
        im = (lambda i: (0, 0)) if len(s) == 2 else (lambda i: (0, 0, 0))
        out_specs.append(pl.BlockSpec(s, im, memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(s, jnp.float32))

    f = pl.pallas_call(k, grid=(grid_n,), in_specs=[pl.BlockSpec((TM, E, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)], out_specs=out_specs, out_shape=out_shape)
    tag = "+".join(names) + ("+dfeat" if with_dfeat else "")
    try:
        jax.block_until_ready(jax.jit(f)(a))
        print(f"PASS {tag}", flush=True)
    except Exception as e:
        print(f"FAIL {tag}: {str(e)[:80]}", flush=True)

trial(["dproj"])
trial(["dbias"])
trial(["dw2"])
trial(["dproj", "dbias"])
trial(["dproj", "dw2"])
trial(["dbias", "dw2"])
trial(["dproj", "dbias", "dw2"], with_dfeat=False)
