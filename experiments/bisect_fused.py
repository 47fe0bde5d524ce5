"""Bisect which part of the fused fwd kernel Mosaic rejects."""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM, E, G, D, Q, C, O = 128, 32, 2, 9, 32, 64, 64
GD, GQ = G * D, G * Q
MP = 1024  # small M for fast compile

STAGES = {}


def stage(fn):
    STAGES[fn.__name__] = fn
    return fn


def make_inputs(key):
    ks = jax.random.split(key, 5)
    geo = jax.random.normal(ks[0], (MP * E, GD))
    feat = jax.random.normal(ks[1], (MP, E, C))
    proj = jax.random.normal(ks[2], (GD, GQ)) * 0.2
    bias = jax.random.normal(ks[3], (1, GQ)) * 0.1
    w2 = jax.random.normal(ks[4], (GQ, C, O)) * 0.1
    return geo, feat, proj, bias, w2


def call(kernel, out_shape, *arrays):
    grid = (MP // TM,)
    specs = [
        pl.BlockSpec((TM * E, GD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TM, E, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((GD, GQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, GQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((GQ, C, O), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ][: len(arrays)]
    return jax.jit(
        pl.pallas_call(
            kernel, grid=grid, in_specs=specs,
            out_specs=out_shape[1], out_shape=out_shape[0],
        )
    )(*arrays)


def out3(shape):
    return (
        jax.ShapeDtypeStruct(shape, jnp.float32),
        pl.BlockSpec(
            (shape[0], TM, shape[2]) if len(shape) == 3 else (TM, shape[1]),
            (lambda i: (0, i, 0)) if len(shape) == 3 else (lambda i: (i, 0)),
            memory_space=pltpu.VMEM,
        ),
    )


@stage
def s1_pne(key):
    geo, feat, proj, bias, w2 = make_inputs(key)

    def k(g_ref, f_ref, p_ref, b_ref, o_ref):
        pre = jnp.dot(g_ref[:], p_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = jax.nn.gelu(pre + b_ref[:])

    shape = jax.ShapeDtypeStruct((MP * E, GQ), jnp.float32)
    spec = pl.BlockSpec((TM * E, GQ), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return call(k, (shape, spec), geo, feat, proj, bias)


@stage
def s2_agg(key):
    geo, feat, proj, bias, w2 = make_inputs(key)

    def k(g_ref, f_ref, p_ref, b_ref, o_ref):
        pre = jnp.dot(g_ref[:], p_ref[:], preferred_element_type=jnp.float32)
        pne = jax.nn.gelu(pre + b_ref[:]).reshape(TM, E, GQ)
        o_ref[:] = jax.lax.dot_general(
            pne, f_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    shape = jax.ShapeDtypeStruct((MP, GQ, C), jnp.float32)
    spec = pl.BlockSpec((TM, GQ, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return call(k, (shape, spec), geo, feat, proj, bias)


@stage
def s3_swap(key):
    geo, feat, proj, bias, w2 = make_inputs(key)

    def k(g_ref, f_ref, p_ref, b_ref, o_ref):
        pre = jnp.dot(g_ref[:], p_ref[:], preferred_element_type=jnp.float32)
        pne = jax.nn.gelu(pre + b_ref[:]).reshape(TM, E, GQ)
        basis_t = jax.lax.dot_general(
            pne, f_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = jnp.swapaxes(basis_t, 0, 1)

    shape = jax.ShapeDtypeStruct((GQ, MP, C), jnp.float32)
    spec = pl.BlockSpec((GQ, TM, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return call(k, (shape, spec), geo, feat, proj, bias)


@stage
def s4_wcontract(key):
    geo, feat, proj, bias, w2 = make_inputs(key)

    def k(g_ref, f_ref, p_ref, b_ref, w_ref, o_ref):
        pre = jnp.dot(g_ref[:], p_ref[:], preferred_element_type=jnp.float32)
        pne = jax.nn.gelu(pre + b_ref[:]).reshape(TM, E, GQ)
        basis_t = jax.lax.dot_general(
            pne, f_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        basis_b = jnp.swapaxes(basis_t, 0, 1)
        per_gq = jax.lax.dot_general(
            basis_b, w_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = per_gq

    shape = jax.ShapeDtypeStruct((GQ, MP, O), jnp.float32)
    spec = pl.BlockSpec((GQ, TM, O), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return call(k, (shape, spec), geo, feat, proj, bias, w2)


@stage
def s5_reduce(key):
    geo, feat, proj, bias, w2 = make_inputs(key)

    def k(g_ref, f_ref, p_ref, b_ref, w_ref, o_ref):
        pre = jnp.dot(g_ref[:], p_ref[:], preferred_element_type=jnp.float32)
        pne = jax.nn.gelu(pre + b_ref[:]).reshape(TM, E, GQ)
        basis_t = jax.lax.dot_general(
            pne, f_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        basis_b = jnp.swapaxes(basis_t, 0, 1)
        per_gq = jax.lax.dot_general(
            basis_b, w_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = jnp.sum(per_gq.reshape(G, Q, TM, O), axis=1)

    return call(k, out3((G, MP, O)), geo, feat, proj, bias, w2)


@stage
def s6_vmap(key):
    geo, feat, proj, bias, w2 = make_inputs(key)
    geo = geo[None]
    feat = feat[None]

    def k(g_ref, f_ref, p_ref, b_ref, w_ref, o_ref):
        pre = jnp.dot(g_ref[:], p_ref[:], preferred_element_type=jnp.float32)
        pne = jax.nn.gelu(pre + b_ref[:]).reshape(TM, E, GQ)
        basis_t = jax.lax.dot_general(
            pne, f_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        basis_b = jnp.swapaxes(basis_t, 0, 1)
        per_gq = jax.lax.dot_general(
            basis_b, w_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = jnp.sum(per_gq.reshape(G, Q, TM, O), axis=1)

    def single(g2, fg):
        grid = (MP // TM,)
        specs = [
            pl.BlockSpec((TM * E, GD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, E, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GD, GQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GQ, C, O), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            k, grid=grid, in_specs=specs,
            out_specs=pl.BlockSpec((G, TM, O), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, MP, O), jnp.float32),
        )(g2, fg, proj, bias, w2)

    return jax.jit(jax.vmap(single))(geo, feat)


# --- backward-kernel suspects -------------------------------------------------

def _append_stage(fn):
    STAGES[fn.__name__] = fn
    return fn


@_append_stage
def b1_jvp_gelu(key):
    (a,) = [jax.random.normal(key, (TM * E, GQ))]

    def k(a_ref, o_ref):
        out, dout = jax.jvp(jax.nn.gelu, (a_ref[:],), (jnp.ones_like(a_ref[:]),))
        o_ref[:] = out + dout

    shape = jax.ShapeDtypeStruct((TM * E, GQ), jnp.float32)
    return jax.jit(pl.pallas_call(k, out_shape=shape))(a)


@_append_stage
def b2_gexp(key):
    (a,) = [jax.random.normal(key, (G, TM, O))]

    def k(a_ref, o_ref):
        g = a_ref[:]
        o_ref[:] = jnp.broadcast_to(g[:, None], (G, Q) + g.shape[1:]).reshape(
            GQ, TM, O
        )

    shape = jax.ShapeDtypeStruct((GQ, TM, O), jnp.float32)
    return jax.jit(pl.pallas_call(k, out_shape=shape))(a)


@_append_stage
def b3_dw2_contract11(key):
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (GQ, TM, C))
    b = jax.random.normal(k2, (GQ, TM, O))

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    shape = jax.ShapeDtypeStruct((GQ, C, O), jnp.float32)
    return jax.jit(pl.pallas_call(k, out_shape=shape))(a, b)


@_append_stage
def b4_rank3_accum(key):
    (a,) = [jax.random.normal(key, (MP, C))]

    def k(a_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.broadcast_to(
            jnp.sum(a_ref[:], axis=0)[None, :, None], (GQ, C, O)
        )

    out = pl.pallas_call(
        k,
        grid=(MP // TM,),
        in_specs=[pl.BlockSpec((TM, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((GQ, C, O), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GQ, C, O), jnp.float32),
    )
    return jax.jit(out)(a)


@_append_stage
def b5_merge_back(key):
    (a,) = [jax.random.normal(key, (TM, E, GQ))]

    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:].reshape(TM * E, GQ) * 2.0

    shape = jax.ShapeDtypeStruct((TM * E, GQ), jnp.float32)
    return jax.jit(pl.pallas_call(k, out_shape=shape))(a)


def main():
    names = sys.argv[1:] or list(STAGES)
    seed = int.from_bytes(os.urandom(8), "little") % (2**31)
    key = jax.random.PRNGKey(seed)
    for name in names:
        key, sub = jax.random.split(key)
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(STAGES[name](sub))
            print(f"PASS {name:16s} {time.perf_counter()-t0:6.2f}s")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name:16s} {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
