"""Sorted segment sum for the conv backward's feature-gradient reduction.

The reference's CUDA backward scatters per-edge feature gradients with
``atomicAdd`` (``feat_basis_proj_grads.cu:26-217``).  The XLA equivalent
(``zeros.at[idx].add``) costs as much as the whole fused kernel at bench
shapes (~19.5 ms, experiments/chip_ablate.py).  This module implements the
TPU-native alternative: with edges pre-sorted by source point (a
per-neighborhood table, amortised over every conv layer on it), the
reduction becomes

  1. one streaming blocked **cumsum** over the sorted payload — a single
     Pallas pass whose block-local prefix is a lower-triangular matmul on
     the MXU with an f32 carry across sequential grid steps, and
  2. a cheap boundary gather: ``sum(run n) = prefix[end_n] -
     prefix[start_n]``.

Accumulation is f32 regardless of payload dtype (same contract as the
scatter path).  The cumsum's prefix-difference introduces a relative
error ~eps*sqrt(E) vs direct summation — orders of magnitude below bf16
input precision.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blocked_cumsum", "sorted_segment_sum"]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _cumsum_kernel(x_ref, out_ref, carry_ref, *, block: int):
    # Lower-triangular ones (incl. diagonal): local[i] = sum_{j<=i} x[j].
    row = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    tri = (col <= row).astype(x_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    local = jnp.dot(tri, x_ref[:], preferred_element_type=jnp.float32)
    out = local + carry_ref[0][None, :]
    out_ref[:] = out
    carry_ref[0] = out[block - 1]


def blocked_cumsum(x: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """f32 inclusive cumsum along axis 0 of ``[E, C]`` in ONE memory pass.

    XLA lowers a long cumsum to O(log E) full passes; this kernel streams
    the array once, computing each block's local prefix as a triangular
    matmul and carrying the running total in VMEM scratch across the
    sequential grid.
    """
    e, c = x.shape
    ep = ((e + block - 1) // block) * block
    if ep != e:
        x = jnp.pad(x, ((0, ep - e), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_cumsum_kernel, block=block),
        grid=(ep // block,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (block, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ep, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, c), jnp.float32)],
        interpret=_interpret(),
    )(x)
    return out[:e]


def sorted_segment_sum(
    data: jnp.ndarray,
    run_start: jnp.ndarray,
    run_end: jnp.ndarray,
    block: int = 256,
) -> jnp.ndarray:
    """Per-segment sums of ``data [E, C]`` whose rows are grouped into
    contiguous runs ``[run_start[n], run_end[n])`` (edges pre-sorted by
    segment).  Returns ``[N, C]`` f32.
    """
    prefix = blocked_cumsum(data, block=block)
    padded = jnp.concatenate(
        [jnp.zeros((1, data.shape[1]), jnp.float32), prefix], axis=0
    )
    return jnp.take(padded, run_end, axis=0) - jnp.take(
        padded, run_start, axis=0
    )
