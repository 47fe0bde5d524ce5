"""Probe which Mosaic (Pallas-TPU) patterns this toolchain accepts.

Each probe is a minimal pallas_call exercising one dot_general / reshape /
slice pattern needed by candidate fused-conv formulations.  Run on the real
chip; prints PASS/FAIL + single-shot time per pattern (fresh entropy inputs,
so the platform execution cache can never serve a replay).

Usage: python experiments/probe_mosaic.py [name ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 128  # M-tile
E = 32    # edges (K*F)
G = 2     # out frames
D = 9     # pne input dims
Q = 32    # basis
C = 64    # channels
O = 64    # out channels

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def run_kernel(kernel, out_shape, *arrays, grid=None, in_specs=None, out_specs=None):
    kwargs = {}
    if grid is not None:
        kwargs["grid"] = grid
    if in_specs is not None:
        kwargs["in_specs"] = in_specs
    if out_specs is not None:
        kwargs["out_specs"] = out_specs
    else:
        kwargs["out_specs"] = pl.BlockSpec(memory_space=pltpu.VMEM)
    if in_specs is None:
        kwargs["in_specs"] = [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in arrays
        ]
    f = pl.pallas_call(kernel, out_shape=out_shape, **kwargs)
    return jax.jit(f)(*arrays)


def fresh(key, *shape_dtypes):
    ks = jax.random.split(key, len(shape_dtypes))
    return [
        jax.random.normal(k, s).astype(dt) for k, (s, dt) in zip(ks, shape_dtypes)
    ]


# --- dot_general patterns ----------------------------------------------------

@probe
def p1_plain_2d(key):
    """[TM*E*G, D] @ [D, Q] plain 2D."""
    a, b = fresh(key, ((TM * E * G, D), jnp.float32), ((D, Q), jnp.float32))

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    return run_kernel(k, jax.ShapeDtypeStruct((TM * E * G, Q), jnp.float32), a, b)


@probe
def p2_leading_batch(key):
    """batched over m: [TM, E, C] x [TM, E, Q] -> [TM, C, Q]."""
    a, b = fresh(key, ((TM, E, C), jnp.float32), ((TM, E, Q), jnp.float32))

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    return run_kernel(k, jax.ShapeDtypeStruct((TM, C, Q), jnp.float32), a, b)


@probe
def p3_multi_contract(key):
    """[TM, C, Q] x [C, Q, O] contracting (1,2)x(0,1) -> [TM, O]."""
    a, b = fresh(key, ((TM, C, Q), jnp.float32), ((C, Q, O), jnp.float32))

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return run_kernel(k, jax.ShapeDtypeStruct((TM, O), jnp.float32), a, b)


@probe
def p4_free_dims_rhs(key):
    """[TM, E, C] x [TM, E, G, Q] -> [TM, C, G, Q] (2 free dims on rhs)."""
    a, b = fresh(key, ((TM, E, C), jnp.float32), ((TM, E, G, Q), jnp.float32))

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    return run_kernel(k, jax.ShapeDtypeStruct((TM, C, G, Q), jnp.float32), a, b)


@probe
def p5_lane_merge(key):
    """reshape [TM, E, G, Q] -> [TM, E, G*Q] (merge sublane into lane)."""
    (a,) = fresh(key, ((TM, E, G, Q), jnp.float32))

    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:].reshape(TM, E, G * Q)

    return run_kernel(k, jax.ShapeDtypeStruct((TM, E, G * Q), jnp.float32), a)


@probe
def p6_sublane_split(key):
    """reshape [TM*E*G, Q] -> [TM, E*G, Q] (split leading dim)."""
    (a,) = fresh(key, ((TM * E * G, Q), jnp.float32))

    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:].reshape(TM, E * G, Q)

    return run_kernel(k, jax.ShapeDtypeStruct((TM, E * G, Q), jnp.float32), a)


@probe
def p7_mid_slice(key):
    """static slice on middle dim of rank-4: [TM, E, G, Q] -> g=1 slice."""
    (a,) = fresh(key, ((TM, E, G, Q), jnp.float32))

    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:, :, 1, :]

    return run_kernel(k, jax.ShapeDtypeStruct((TM, E, Q), jnp.float32), a)


@probe
def p8_blockdiag_batched(key):
    """pair-packed blockdiag: [P, 2C, 2E] @ [P, 2E, 2GQ] leading batch."""
    P = TM // 2
    a, b = fresh(
        key, ((P, 2 * C, 2 * E), jnp.float32), ((P, 2 * E, 2 * G * Q), jnp.float32)
    )

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    return run_kernel(
        k, jax.ShapeDtypeStruct((P, 2 * C, 2 * G * Q), jnp.float32), a, b
    )


@probe
def p9_concat_blockdiag_build(key):
    """build blockdiag [P, 2C, 2E] from [TM, C, E] via reshape+concat."""
    (a,) = fresh(key, ((TM, C, E), jnp.float32))
    P = TM // 2

    def k(a_ref, o_ref):
        x = a_ref[:].reshape(P, 2, C, E)
        zero = jnp.zeros((P, C, E), jnp.float32)
        top = jnp.concatenate([x[:, 0], zero], axis=2)     # [P, C, 2E]
        bot = jnp.concatenate([zero, x[:, 1]], axis=2)     # [P, C, 2E]
        o_ref[:] = jnp.concatenate([top, bot], axis=1)     # [P, 2C, 2E]

    return run_kernel(k, jax.ShapeDtypeStruct((P, 2 * C, 2 * E), jnp.float32), a)


@probe
def p10_bf16_batched(key):
    """p2 with bf16 operands, f32 accum."""
    a, b = fresh(key, ((TM, E, C), jnp.bfloat16), ((TM, E, Q), jnp.bfloat16))

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    return run_kernel(k, jax.ShapeDtypeStruct((TM, C, Q), jnp.float32), a, b)


@probe
def p11_grid_accum(key):
    """accumulate a [D?, Q] param grad across grid steps (output revisited)."""
    (a,) = fresh(key, ((8 * TM, Q), jnp.float32))

    def k(a_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.sum(a_ref[:], axis=0, keepdims=True)

    out = pl.pallas_call(
        k,
        grid=(8,),
        in_specs=[pl.BlockSpec((TM, Q), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Q), jnp.float32),
    )
    return jax.jit(out)(a)


@probe
def p12_transpose_last2(key):
    """transpose [TM, C, Q] -> [TM, Q, C] (swap sublane/lane)."""
    (a,) = fresh(key, ((TM, C, Q), jnp.float32))

    def k(a_ref, o_ref):
        o_ref[:] = jnp.swapaxes(a_ref[:], 1, 2)

    return run_kernel(k, jax.ShapeDtypeStruct((TM, Q, C), jnp.float32), a)



@probe
def p13_nt_contract(key):
    """contract last dims of both: [P, E, C] x [P, M2, C] -> [P, E, M2]."""
    P = TM // 2
    a, b = fresh(key, ((P, E, C), jnp.float32), ((P, 2 * Q, C), jnp.float32))

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    return run_kernel(k, jax.ShapeDtypeStruct((P, E, 2 * Q), jnp.float32), a, b)


@probe
def p14_mid_write(key):
    """write [TM, C] into rank-3 ref at mid-dim index q."""
    (a,) = fresh(key, ((TM, C), jnp.float32))

    def k(a_ref, o_ref):
        for q in range(4):
            o_ref[:, q, :] = a_ref[:] * float(q)

    return run_kernel(k, jax.ShapeDtypeStruct((TM, 4, C), jnp.float32), a)


@probe
def p15_dim0_contract(key):
    """[R, D2] x [R, GQ] contract dim0/dim0 -> [D2, GQ] (for dA)."""
    R = TM * E
    a, b = fresh(key, ((R, 2 * D), jnp.float32), ((R, 2 * Q), jnp.float32))

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return run_kernel(k, jax.ShapeDtypeStruct((2 * D, 2 * Q), jnp.float32), a, b)


@probe
def p16_leading_split_rank2(key):
    """reshape [TM*E, GQ] -> [TM, E, GQ] (split leading sublane dim)."""
    (a,) = fresh(key, ((TM * E, 2 * Q), jnp.float32))

    def k(a_ref, o_ref):
        o_ref[:] = a_ref[:].reshape(TM, E, 2 * Q)

    return run_kernel(k, jax.ShapeDtypeStruct((TM, E, 2 * Q), jnp.float32), a)


@probe
def p17_outer_swap(key):
    """transpose [TM, C, Q] -> [C, TM, Q] (swap two non-lane dims)."""
    (a,) = fresh(key, ((TM, C, Q), jnp.float32))

    def k(a_ref, o_ref):
        o_ref[:] = jnp.swapaxes(a_ref[:], 0, 1)

    return run_kernel(k, jax.ShapeDtypeStruct((C, TM, Q), jnp.float32), a)


def main():
    names = sys.argv[1:] or list(PROBES)
    seed = int.from_bytes(os.urandom(8), "little") % (2**31)
    key = jax.random.PRNGKey(seed)
    for name in names:
        fn = PROBES[name]
        key, sub = jax.random.split(key)
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(sub))
            dt = time.perf_counter() - t0
            shape = jax.tree_util.tree_leaves(out)[0].shape
            print(f"PASS {name:28s} compile+run {dt:7.3f}s out{shape}")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"FAIL {name:28s} {type(e).__name__}: {msg}")
    print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
