"""Time fwd kernel stages at full scale to find the slow op."""
import os, sys, time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = int(os.environ.get("M", "65536"))
TM = int(os.environ.get("TM", "64"))
E, G, D, Q, C, O = 32, 2, 9, 32, 64, 64
GD1, GQ = G * D + 1, G * Q
STAGE = sys.argv[1] if len(sys.argv) > 1 else "full"
CDT = jnp.bfloat16 if os.environ.get("CDT") == "bf16" else None

def cast(x):
    return x if CDT is None else x.astype(CDT)

def kern(g_ref, f_ref, p_ref, w_ref, o_ref):
    pre = jnp.dot(cast(g_ref[:]), cast(p_ref[:]), preferred_element_type=jnp.float32)
    pne = jax.nn.gelu(pre)
    if STAGE == "pne":
        o_ref[:] = jnp.broadcast_to(jnp.sum(pne)[None, None, None], o_ref.shape)
        return
    pne3 = cast(pne.reshape(TM, E, GQ))
    feat = cast(f_ref[:])
    basis_t = jax.lax.dot_general(
        pne3, feat, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if STAGE == "agg":
        o_ref[:] = jnp.broadcast_to(jnp.sum(basis_t)[None, None, None], o_ref.shape)
        return
    basis_b = cast(jnp.swapaxes(basis_t, 0, 1))
    if STAGE == "swap":
        o_ref[:] = jnp.broadcast_to(jnp.sum(basis_b)[None, None, None], o_ref.shape)
        return
    per_gq = jax.lax.dot_general(
        basis_b, cast(w_ref[:]), dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = jnp.sum(per_gq.reshape(G, Q, TM, O), axis=1)

@jax.jit
def run(geo, feat, proj, w2):
    out = pl.pallas_call(
        kern, grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM * E, GD1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, E, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GD1, GQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GQ, C, O), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, TM, O), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, M, O), jnp.float32),
    )(geo, feat, proj, w2)
    return jnp.sum(out)

seed = int.from_bytes(os.urandom(8), "little") % (2**31)

@jax.jit
def make(key):
    k = jax.random.split(key, 4)
    return (jax.random.normal(k[0], (M * E, GD1)),
            jax.random.normal(k[1], (M, E, C)),
            jax.random.normal(k[2], (GD1, GQ)) * 0.2,
            jax.random.normal(k[3], (GQ, C, O)) * 0.1)

key = jax.random.PRNGKey(seed)
for i in range(4):
    key, sub = jax.random.split(key)
    args = make(sub)
    float(jax.device_get(sum(jnp.sum(a[:1]) for a in args)))
    t0 = time.perf_counter()
    float(jax.device_get(run(*args)))
    dt = time.perf_counter() - t0
    if i:
        print(f"{STAGE:5s} tm={TM}: {dt*1e3:8.2f} ms  {M/dt/1e6:6.2f} M pts/s", flush=True)
