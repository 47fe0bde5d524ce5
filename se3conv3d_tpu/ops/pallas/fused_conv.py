"""Fused PNE basis-projection convolution as a Pallas TPU kernel.

One kernel computes, per tile of query points, what the reference splits
across ``LinearPNE``/``KPPNE`` + CUDA ``feat_basis_proj`` + the weight
einsum (reference ``custom_ops/PNE.py``, ``feat_basis_proj.cu:24-185``,
``layers/PNEConvLayer.py:218-229``):

    pne   = act(geo @ proj_axes + bias) * mask          [M, K, Q]
    basis = sum_k  feat[m, k, :] (x) pne[m, k, :]        [M, C, Q]
    out   = basis.reshape(M, C*Q) @ W.reshape(C*Q, O)    [M, O]

The edge embedding ``pne`` and the per-point ``basis`` live only in VMEM —
they are never materialised in HBM.  Neighbor features are gathered by XLA
before the kernel (a TPU gather the compiler handles well); the kernel's
custom VJP routes gradients to ``proj_axes``/``bias``/``W``/``features``
and, like the reference, NOT to the geometry (``custom_ops/PNE.py:57-61``).

The rot-equivariant conv is the same kernel with the (K, G, F) edge axes
folded: per out-frame g, edges are the K*F (neighbor, in-frame) pairs —
see ``fused_equiv_basis_conv``.

Shapes are padded to TPU tiles internally; use ``interpret=True`` (set by
``FUSED_CONV_INTERPRET``) to run on CPU in tests.

Status: correctness-validated against the XLA einsum path (forward,
gradients, equivariant folding — ``tests/test_pallas_conv.py``) in
interpreter mode only.  RETRACTION (round 2): the round-1 claim that the
XLA einsum path "sits at the matmul roofline at ~1.2B pts/s" was a
measurement artifact — this platform serves repeated identical
(executable, input) executions from a cache, and the old bench replayed a
fixed input stream.  Honest single-shot measurement on fresh inputs puts
the XLA einsum path near ~0.4M pts/s fwd+bwd (~0.5% MFU): XLA does NOT
fuse the gathered-feature/pne/basis intermediates out of HBM at these
shapes.  The fusion this file was built for is therefore the critical
path; the Mosaic toolchain here rejects its batched rank-3 ``dot_general``
with non-leading batch dims (HTTP 500), so the production kernel lives in
``fused_equiv.py`` using a block-diagonal reformulation that Mosaic
accepts.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_basis_conv", "fused_equiv_basis_conv"]

# Flip to True to run kernels in interpreter mode (CPU tests).
FUSED_CONV_INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _act(name: str) -> Callable:
    return {
        "gelu": jax.nn.gelu,
        "relu": jax.nn.relu,
        "sin": jnp.sin,
        "linear": lambda x: x,
    }[name]


def _fwd_kernel(geo_ref, feat_ref, mask_ref, a_ref, b_ref, w_ref, out_ref,
                *, act: str, tm: int, k: int):
    """One M-tile: pne -> basis -> weight contraction, all in VMEM.

    Formulated purely with ``dot_general`` (no reshapes) — Mosaic rejects
    shape casts that fold the lane dimension.
    """
    # pre[m, k, q] = geo[m, k, d] @ A[d, q]
    pre = jax.lax.dot_general(
        geo_ref[:], a_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pre = pre + b_ref[:][None, :, :]  # bias shaped [1, q]
    pne = _act(act)(pre) * mask_ref[:][:, :, None]

    # basis[m, c, q] = sum_k feat[m, k, c] * pne[m, k, q]
    basis = jax.lax.dot_general(
        feat_ref[:], pne,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [tm, c, q]
    # out[m, o] = sum_c sum_q basis[m, c, q] * W[c, q, o]: Mosaic's matmul
    # takes one contracting dim, so contract q batched over c, then reduce c.
    per_c = jax.lax.dot_general(
        basis, w_ref[:],
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [c, tm, o]
    out_ref[:] = jnp.sum(per_c, axis=0)


def _bwd_kernel(geo_ref, feat_ref, mask_ref, a_ref, b_ref, w_ref, g_ref,
                dfeat_ref, da_ref, db_ref, dw_ref, *, act: str, tm: int, k: int):
    """Backward tile: accumulate dA/db/dW across the grid, write dfeat."""
    pre = jax.lax.dot_general(
        geo_ref[:], a_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pre = pre + b_ref[:][None, :, :]
    mask = mask_ref[:][:, :, None]

    act_fn = _act(act)
    pne = act_fn(pre) * mask
    # d(act)/d(pre) via jvp trick (elementwise).
    _, dact = jax.jvp(act_fn, (pre,), (jnp.ones_like(pre),))

    basis = jax.lax.dot_general(
        feat_ref[:], pne,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [tm, c, q]

    g = g_ref[:]  # [tm, o]
    # dW[c, q, o] += sum_m basis[m, c, q] * g[m, o]: contract m with a
    # single contracting dim; free dims (c, q) x (o).
    dw = jax.lax.dot_general(
        basis, g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [c, q, o]
    # dbasis[m, c, q] = sum_o g[m, o] * W[c, q, o]: contract o batched over
    # nothing; free dims (tm) x (c, q) -> [tm, c, q].
    dbasis = jax.lax.dot_general(
        g, w_ref[:],
        dimension_numbers=(((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tm, c, q]

    # dpne[m, k, q] = sum_c feat[m, k, c] * dbasis[m, c, q]
    dpne = jax.lax.dot_general(
        feat_ref[:], dbasis,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [tm, k, q]
    # dfeat[m, k, c] = sum_q pne[m, k, q] * dbasis[m, c, q]
    dfeat_ref[:] = jax.lax.dot_general(
        pne, dbasis,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [tm, k, c]

    dpre = dpne * mask * dact
    # dA[d, q] = sum_{m, k} geo[m, k, d] * dpre[m, k, q]: contract m batched
    # over k, then reduce k.
    da_k = jax.lax.dot_general(
        geo_ref[:], dpre,
        dimension_numbers=(((0,), (0,)), ((1,), (1,))),
        preferred_element_type=jnp.float32,
    )  # [k, d, q]
    da = jnp.sum(da_k, axis=0)
    db = jnp.sum(dpre, axis=(0, 1), keepdims=False)[None, :]

    @pl.when(pl.program_id(0) == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    da_ref[:] += da
    db_ref[:] += db
    dw_ref[:] += dw


def _pad_inputs(geo, feat, mask, tm):
    m = geo.shape[0]
    pad = _round_up(m, tm) - m
    if pad:
        geo = jnp.pad(geo, ((0, pad), (0, 0), (0, 0)))
        feat = jnp.pad(feat, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
    return geo, feat, mask, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_single(geo, feat, mask, proj_axes, proj_biases, weights,
                  act: str, tm: int):
    out, _ = _fused_fwd(geo, feat, mask, proj_axes, proj_biases, weights, act, tm)
    return out


def _fused_fwd(geo, feat, mask, proj_axes, proj_biases, weights, act, tm):
    m0, k, d = geo.shape
    c = feat.shape[-1]
    q = proj_axes.shape[-1]
    o = weights.shape[-1]
    bias2 = proj_biases.reshape(1, q)
    geo_p, feat_p, mask_p, m0 = _pad_inputs(geo, feat, mask.astype(geo.dtype), tm)
    mp = geo_p.shape[0]
    grid = (mp // tm,)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, tm=tm, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, q, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, o), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, o), jnp.float32),
        interpret=FUSED_CONV_INTERPRET,
    )(geo_p, feat_p, mask_p, proj_axes, bias2, weights)
    out = out[:m0]
    return out, (geo, feat, mask, proj_axes, proj_biases, weights)


def _fused_bwd(act, tm, residuals, g):
    geo, feat, mask, proj_axes, proj_biases, weights = residuals
    m0, k, d = geo.shape
    c = feat.shape[-1]
    q = proj_axes.shape[-1]
    o = weights.shape[-1]
    bias2 = proj_biases.reshape(1, q)
    geo_p, feat_p, mask_p, m0 = _pad_inputs(geo, feat, mask.astype(geo.dtype), tm)
    mp = geo_p.shape[0]
    g_p = jnp.pad(g, ((0, mp - m0), (0, 0))) if mp != m0 else g
    grid = (mp // tm,)

    dfeat, da, db, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act, tm=tm, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, q, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, o), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, k, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, q, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k, c), jnp.float32),
            jax.ShapeDtypeStruct((d, q), jnp.float32),
            jax.ShapeDtypeStruct((1, q), jnp.float32),
            jax.ShapeDtypeStruct((c, q, o), jnp.float32),
        ],
        interpret=FUSED_CONV_INTERPRET,
    )(geo_p, feat_p, mask_p, proj_axes, bias2, weights, g_p)

    return (
        None,  # geometry: gradients stopped, like the reference
        dfeat[:m0],
        None,  # mask
        da,
        db.reshape(q),
        dw,
    )


_fused_single.defvjp(_fused_fwd, _fused_bwd)


def fused_basis_conv(
    geo: jnp.ndarray,
    gathered_feats: jnp.ndarray,
    mask: jnp.ndarray,
    proj_axes: jnp.ndarray,
    proj_biases: jnp.ndarray,
    conv_weights: jnp.ndarray,
    act: str = "gelu",
    tile_m: int = 128,
) -> jnp.ndarray:
    """Fused standard PNE conv over a batch.

    Args:
      geo: ``[B, M, K, D]`` PNE inputs (normalised offsets, or offsets+rot).
      gathered_feats: ``[B, M, K, C]`` pre-gathered neighbor features.
      mask: ``[B, M, K]`` edge validity.
      proj_axes / proj_biases: ``[D, Q]`` / ``[Q]``.
      conv_weights: ``[C, Q, O]``.
    Returns:
      ``[B, M, O]`` (un-normalised: apply ``norm_num_neighs`` outside).
    """
    fn = functools.partial(_fused_single, act=act, tm=tile_m)
    return jax.vmap(fn, in_axes=(0, 0, 0, None, None, None))(
        geo, gathered_feats, mask, proj_axes, proj_biases, conv_weights
    )


def fused_equiv_basis_conv(
    geo: jnp.ndarray,
    gathered_feats: jnp.ndarray,
    mask: jnp.ndarray,
    proj_axes: jnp.ndarray,
    proj_biases: jnp.ndarray,
    conv_weights: jnp.ndarray,
    act: str = "gelu",
    tile_m: int = 128,
) -> jnp.ndarray:
    """Fused rot-equivariant PNE conv.

    Args:
      geo: ``[B, M, K, G, F, 9]`` per-edge, per-frame-pair PNE inputs
        (offset-in-receiver-frame ++ 6D relative rotation).
      gathered_feats: ``[B, M, K, F, C]``.
      mask: ``[B, M, K]``.
    Returns:
      ``[B, M, G, O]`` (apply ``norm/F`` outside).

    The (K, F) product folds into the kernel's edge axis; out-frames G map
    onto extra batch rows.
    """
    b, m, k, g_frames, f, d = geo.shape
    c = gathered_feats.shape[-1]
    # [B, G, M, K*F, D]: fold frame pairs into edges, out-frames into batch.
    geo_f = geo.transpose(0, 3, 1, 2, 4, 5).reshape(b * g_frames, m, k * f, d)
    feat_f = jnp.broadcast_to(
        gathered_feats[:, None], (b, g_frames, m, k, f, c)
    ).reshape(b * g_frames, m, k * f, c)
    mask_f = jnp.broadcast_to(
        mask[:, None, :, :, None], (b, g_frames, m, k, f)
    ).reshape(b * g_frames, m, k * f)
    out = fused_basis_conv(
        geo_f, feat_f, mask_f, proj_axes, proj_biases, conv_weights,
        act=act, tile_m=tile_m,
    )
    return out.reshape(b, g_frames, m, -1).transpose(0, 2, 1, 3)
