"""Production fused PNE basis-projection conv (Pallas TPU kernel).

One kernel per M-tile computes the whole conv hot loop of the reference —
``LinearPNE`` + CUDA ``feat_basis_proj`` + weight einsum, and for the
equivariant path the frame-expanded edge list of
``PNEConvLayerRotEquiv.__compute_convolution__``
(reference ``custom_ops/PNE.py:38-40``, ``feat_basis_proj.cu:24-185``,
``PNEConvLayerRotEquiv.py:92-216``) — keeping the two huge intermediates
(the per-edge embedding ``pne`` and the per-point ``basis``) in VMEM only.
At DFaust-bench scale those tensors are 537 MB / 1 GB in f32; the XLA
einsum path round-trips both through HBM, which is why it measures ~0.5%
MFU.  Gradients flow to ``proj``/``bias``/``weights``/``features`` and not
to geometry, matching the reference (``custom_ops/PNE.py:57-61``).

Layout: the per-edge geometry arrives TRANSPOSED and packed,
``geo_t [B, G*(D+1), M*E]`` — rows are (out-frame, pne-input-dim [+ones]),
lanes are edges.  On TPU an array's minor dim pads to 128 lanes, so the
natural ``[edges, 19]`` layout wastes 6.4x HBM capacity and bandwidth;
transposed, the edge axis fills lanes exactly and the PNE embedding
becomes ``projT [GQ, GD1] @ geo_t`` — an even better MXU shape (0.125
issues/point at trunk shapes).  The ``norm_neigh_dist`` scale and the
bias fold into the projection rows (algebraically identical), so cached
geometry is layer-independent.

Mosaic constraints measured on this toolchain (experiments/probe_mosaic.py
and experiments/bisect_*.py):

  * lane-merging reshapes, multi-dim contractions and free-dims /
    non-leading-batch ``dot_general`` fail to compile;
  * leading-dim reshapes, mid-dim slices, leading-batch and NT
    (last/last) contractions, sublane/lane transposes and
    revisited-output grid accumulation pass;
  * a kernel with FOUR outputs fails; any three pass (hence the bias
    rides the geometry's ones-rows instead of having its own grad
    output);
  * single-call programs past ~48k query points fail to compile — the
    callers in ``ops/pne_conv.py`` chunk the M axis under ``lax.scan``.

The caller-side prep (per-component geometry build, gather, mask,
block-diag/transpose of params) stays in XLA: the custom VJP wraps only
the kernel, so XLA autodiff delivers the scatter-add of feature grads and
the fold-back of ``d(projT) -> (d proj, d bias)`` for free.

Shape glossary: M query points, E = K*F edges per point (K neighbors x
F in-frames; F=1 for the standard conv), G out-frames (1 for standard),
D pne input dims (3 offsets [+ R rot dims]), Q num_basis, C/O channels.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_pne_conv", "fused_pne_conv_bwd", "FUSED_INTERPRET"]

# Flip to force interpreter mode; on the CPU backend the kernels always
# run interpreted (Mosaic compiles for TPU only).
FUSED_INTERPRET = False


def _interpret() -> bool:
    return FUSED_INTERPRET or jax.default_backend() == "cpu"

def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7): Mosaic's TC
    lowering has no erf/erfc primitive, and the reference's gelu is the
    exact (erf) torch default."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


_SQRT_HALF = 0.7071067811865476

_ACTS = {
    # exact (erf) gelu via the polynomial, matching torch's default
    "gelu": lambda x: x * 0.5 * (1.0 + _erf_poly(x * _SQRT_HALF)),
    "relu": jax.nn.relu,
    "sin": jnp.sin,
    "linear": lambda x: x,
}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _act_and_grad(name: str, pre: jnp.ndarray):
    """act(pre), act'(pre) — elementwise, traced inside the kernel.

    gelu uses the closed form d(gelu)/dx = Phi(x) + x*phi(x) (normal CDF
    + x * pdf): differentiating the erf polynomial through autodiff
    amplifies its oscillating approximation error ~100x, which showed up
    as 4e-3 errors in the proj gradient."""
    if name == "gelu":
        phi_cdf = 0.5 * (1.0 + _erf_poly(pre * _SQRT_HALF))
        pdf = 0.3989422804014327 * jnp.exp(-0.5 * pre * pre)
        return pre * phi_cdf, phi_cdf + pre * pdf
    fn = _ACTS[name]
    out, dout = jax.jvp(fn, (pre,), (jnp.ones_like(pre),))
    return out, dout


def _cast(x, dtype):
    return x if dtype is None else x.astype(dtype)


def _blk2(x):
    """Pair-pack ``[TM, A, B] -> [TM//2, 2A, 2B]`` block-diagonal.

    Two points' per-point matmuls fuse into ONE MXU issue: a batched
    per-point dot like ``[GQ, E] @ [E, C]`` uses a fraction of the
    128x128x128 MXU tile, and the pair blockdiag fills it (probes
    p8/p9/b3) — halving the per-point issue count for a few VMEM copies.
    """
    p = x.shape[0] // 2
    a, b = x.shape[1], x.shape[2]
    x4 = x.reshape(p, 2, a, b)
    z = jnp.zeros((p, a, b), x.dtype)
    top = jnp.concatenate([x4[:, 0], z], axis=2)
    bot = jnp.concatenate([z, x4[:, 1]], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _unblk2(r, a, b):
    """Extract the diagonal blocks: ``[P, 2A, 2B] -> [2P, A, B]``."""
    top = r[:, :a, :b]
    bot = r[:, a:, b:]
    return jnp.concatenate(
        [top[:, None], bot[:, None]], axis=1
    ).reshape(2 * r.shape[0], a, b)


# Pair-packing on/off (A/B measurement; tiles must be even-sized).
PAIR_PACK = False


def _dot_e_contract(lhs, rhs, cdt):
    """``out[m, X, Y] = sum_e lhs[m, e, X] * rhs[m, e, Y]`` (contract dim 1)."""
    if PAIR_PACK and lhs.shape[0] % 2 == 0:
        r = jax.lax.dot_general(
            _cast(_blk2(lhs), cdt), _cast(_blk2(rhs), cdt),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return _unblk2(r, lhs.shape[2], rhs.shape[2])
    return jax.lax.dot_general(
        _cast(lhs, cdt), _cast(rhs, cdt),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _dot_last_contract(lhs, rhs, cdt):
    """``out[m, A, B] = sum_c lhs[m, A, c] * rhs[m, B, c]`` (NT, dim 2/2)."""
    if PAIR_PACK and lhs.shape[0] % 2 == 0:
        r = jax.lax.dot_general(
            _cast(_blk2(lhs), cdt), _cast(_blk2(rhs), cdt),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return _unblk2(r, lhs.shape[1], rhs.shape[1])
    return jax.lax.dot_general(
        _cast(lhs, cdt), _cast(rhs, cdt),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _dot_mid_contract(lhs, rhs, cdt):
    """``out[m, A, C] = sum_g lhs[m, A, g] * rhs[m, g, C]`` (dim 2/1)."""
    if PAIR_PACK and lhs.shape[0] % 2 == 0:
        r = jax.lax.dot_general(
            _cast(_blk2(lhs), cdt), _cast(_blk2(rhs), cdt),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return _unblk2(r, lhs.shape[1], rhs.shape[2])
    return jax.lax.dot_general(
        _cast(lhs, cdt), _cast(rhs, cdt),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


# --- forward kernel ----------------------------------------------------------


def _fwd_kernel(geo_ref, feat_ref, projT_ref, w2_ref, out_ref, *,
                act: str, tm: int, e: int, g: int, q: int, cdt):
    gq = g * q
    # pre_t[(g q), (m e)] = projT @ geo_t — one plain 2D dot is the whole
    # LinearPNE (bias rides the ones-rows of geo_t, norm scale is folded
    # into projT's offset rows).
    pre_t = jnp.dot(
        _cast(projT_ref[:], cdt), _cast(geo_ref[:], cdt),
        preferred_element_type=jnp.float32,
    )
    pne_t = _ACTS[act](pre_t)                              # [gq, tm*e] f32
    pne3 = _cast(jnp.swapaxes(pne_t, 0, 1).reshape(tm, e, gq), cdt)
    feat = _cast(feat_ref[:], cdt)                         # [tm, e, c]

    # basis_t[m, gq, c] = sum_e pne3[m, e, gq] * feat[m, e, c]
    basis_t = _dot_e_contract(pne3, feat, cdt)             # [tm, gq, c] f32
    basis_b = _cast(jnp.swapaxes(basis_t, 0, 1), cdt)      # [gq, tm, c]

    # per-lane weight contraction, batched over (g, q):
    # out[gq, m, o] = sum_c basis_b[gq, m, c] * W2[gq, c, o]
    per_gq = jax.lax.dot_general(
        basis_b, _cast(w2_ref[:], cdt),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                      # [gq, tm, o]
    out_ref[:] = jnp.sum(per_gq.reshape(g, q, tm, -1), axis=1)


# --- backward kernel ---------------------------------------------------------


def _bwd_kernel(geo_ref, feat_ref, projT_ref, w2_ref, g_ref,
                dfeat_ref, dprojT_ref, dw2_ref, *,
                act: str, tm: int, e: int, g: int, q: int, cdt):
    gq = g * q
    pre_t = jnp.dot(
        _cast(projT_ref[:], cdt), _cast(geo_ref[:], cdt),
        preferred_element_type=jnp.float32,
    )
    pne_t, dact_t = _act_and_grad(act, pre_t)              # [gq, tm*e] f32
    pne3 = _cast(jnp.swapaxes(pne_t, 0, 1).reshape(tm, e, gq), cdt)
    feat = _cast(feat_ref[:], cdt)

    basis_t = _dot_e_contract(pne3, feat, cdt)             # recompute fwd
    basis_b = _cast(jnp.swapaxes(basis_t, 0, 1), cdt)      # [gq, tm, c]

    # cotangent arrives as [g, tm, o]; broadcast over q -> [gq, tm, o].
    gout = g_ref[:]
    g_exp = _cast(
        jnp.broadcast_to(
            gout[:, None], (g, q) + gout.shape[1:]
        ).reshape(gq, *gout.shape[1:]),
        cdt,
    )

    # dW2[gq, c, o] = sum_m basis_b[gq, m, c] * g_exp[gq, m, o]
    dw2 = jax.lax.dot_general(
        basis_b, g_exp,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dbasis_b[gq, m, c] = sum_o g_exp[gq, m, o] * W2[gq, c, o]   (NT)
    dbasis_b = jax.lax.dot_general(
        g_exp, _cast(w2_ref[:], cdt),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dbasis_t = _cast(jnp.swapaxes(dbasis_b, 0, 1), cdt)    # [tm, gq, c]

    # dpne3[m, e, gq] = sum_c feat[m, e, c] * dbasis_t[m, gq, c]  (NT)
    dpne3 = _dot_last_contract(feat, dbasis_t, cdt)
    # dfeat[m, e, c] = sum_gq pne3[m, e, gq] * dbasis_t[m, gq, c]
    dfeat_ref[:] = _dot_mid_contract(pne3, dbasis_t, cdt).astype(
        dfeat_ref.dtype
    )

    dact3 = jnp.swapaxes(dact_t, 0, 1).reshape(tm, e, gq)
    dpre_r = (dpne3 * dact3).reshape(tm * e, gq)           # [tm*e, gq] f32
    # dprojT[gq, gd1] = sum_r dpre_r[r, gq] * geo_t[gd1, r]
    dprojT = jax.lax.dot_general(
        _cast(dpre_r, cdt), _cast(geo_ref[:], cdt),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        dprojT_ref[:] = jnp.zeros_like(dprojT_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    dprojT_ref[:] += dprojT
    dw2_ref[:] += dw2


# --- pallas_call wrappers (single example) -----------------------------------


def _pad_m(geo_t, feat, tm):
    m, e = feat.shape[:2]
    mp = _round_up(max(m, tm), tm)
    if mp != m:
        # Zero-padded geometry rows give pre=0 -> act(0)=0 for all
        # supported activations, and zero features kill every other
        # contribution, so padding is exact.
        geo_t = jnp.pad(geo_t, ((0, 0), (0, (mp - m) * e)))
        feat = jnp.pad(feat, ((0, mp - m), (0, 0), (0, 0)))
    return geo_t, feat, m, mp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_single(geo_t, feat, projT, w2,
                  act: str, g_frames: int, tm: int, cdt_name: Optional[str]):
    out, _ = _fused_single_fwd(
        geo_t, feat, projT, w2, act, g_frames, tm, cdt_name
    )
    return out


def _fused_single_fwd(geo_t, feat, projT, w2, act, g_frames, tm, cdt_name):
    cdt = jnp.dtype(cdt_name) if cdt_name else None
    m0, e, c = feat.shape
    gq, gd1 = projT.shape
    o = w2.shape[-1]
    q = gq // g_frames
    geo_p, feat_p, m0, mp = _pad_m(geo_t, feat, tm)
    grid = (mp // tm,)

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, act=act, tm=tm, e=e, g=g_frames, q=q, cdt=cdt
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gd1, tm * e), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, e, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gq, gd1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gq, c, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g_frames, tm, o), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g_frames, mp, o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(geo_p, feat_p, projT, w2)
    out = out[:, :m0]
    return out, (geo_t, feat, projT, w2)


def _fused_single_bwd(act, g_frames, tm, cdt_name, residuals, gout):
    cdt = jnp.dtype(cdt_name) if cdt_name else None
    geo_t, feat, projT, w2 = residuals
    m0, e, c = feat.shape
    gq, gd1 = projT.shape
    o = w2.shape[-1]
    q = gq // g_frames
    geo_p, feat_p, m0, mp = _pad_m(geo_t, feat, tm)
    gout_p = (
        jnp.pad(gout, ((0, 0), (0, mp - m0), (0, 0))) if mp != m0 else gout
    )
    grid = (mp // tm,)

    dfeat, dprojT, dw2 = pl.pallas_call(
        functools.partial(
            _bwd_kernel, act=act, tm=tm, e=e, g=g_frames, q=q, cdt=cdt
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((gd1, tm * e), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, e, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gq, gd1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gq, c, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_frames, tm, o), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, e, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gq, gd1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gq, c, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, e, c), feat_p.dtype),
            jax.ShapeDtypeStruct((gq, gd1), jnp.float32),
            jax.ShapeDtypeStruct((gq, c, o), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(geo_p, feat_p, projT, w2, gout_p)

    return (
        None,               # geometry: gradients stopped, like the reference
        dfeat[:m0],
        dprojT,
        dw2,
    )


_fused_single.defvjp(_fused_single_fwd, _fused_single_bwd)


# --- public API ---------------------------------------------------------------


def _tile_for(tile_m: int, e: int, c: int, o: int, d: int, g_frames: int,
              q: int, compute_dtype: Optional[str]) -> int:
    """VMEM-aware tile cap against the kernel's 100M vmem_limit_bytes.

    Scoped VMEM ≈ csize * (fixed + per_m * tile):
      * fixed (tile-independent): W2 + its grad accumulator, each
        ``[G*Q, C, O]`` resident for the whole grid;
      * per-m: the double-buffered feat/dfeat/residual blocks (3*e*c*2),
        the basis/dbasis intermediates ``[gq, tm, c]`` (2*gq*c), pne3 /
        dpne3 / dpre (~3*e*gq), g_exp (gq*o), geo (e*G*(d+1)*2) and out
        (2*G*o*2).
    The model reproduces the deepest-ClassNet bwd kernel's measured
    109.88M (f32: c=512, o=128, e=64, gq=64, tile 64) within 3%; the
    80M budget leaves 20M slack under the limit.  In bf16 mode the
    cast-sensitive buffers (feat/geo/pne/basis/w2/g_exp) book 2 bytes
    but the always-f32 parts (dW2/dprojT accumulators, out blocks, the
    pre/act-grad temporaries and dot outputs) stay at 4 — for csize=4
    the terms collapse to the f32-validated arithmetic exactly.
    tile_m=256 was tuned at the bench shape (e=32, c=64 — a ~6% bwd
    win) and survives this cap; ScanNet's deep convs keep their
    measured tile 128."""
    csize = 2 if (
        compute_dtype is not None
        and jnp.dtype(compute_dtype) == jnp.bfloat16
    ) else 4
    gq = g_frames * q
    fixed = gq * c * o * (csize + 4)          # w2 (csize) + dw2 (f32)
    per_m = (
        3 * e * c * 2 * csize                 # feat/dfeat/residual, dbuf
        + gq * c * (csize + 4)                # basis (csize) + dbasis (f32)
        + e * gq * (csize + 2 * 4)            # pne3 + dpne/dact f32 temps
        + gq * o * csize                      # g_exp
        + e * g_frames * (d + 1) * 2 * csize  # geo blocks, dbuf
        + 2 * g_frames * o * 2 * 4            # out blocks (f32), dbuf
    )
    budget = 80 * 1024 * 1024 - fixed
    while tile_m > 32 and tile_m * per_m > budget:
        tile_m //= 2
    return tile_m


def _fold_params(proj_axes, proj_biases, conv_weights, g_frames: int):
    """Kernel operands from the conv parameters: per-block ``[A; b]``
    stacked, block-diagonal over out-frames, transposed; weights
    broadcast over (g, q).  Kept as plain ops so XLA autodiff folds the
    gradients back onto the shared parameters on the non-lean path."""
    proj_aug = jnp.concatenate([proj_axes, proj_biases[None]], axis=0)
    eye = jnp.eye(g_frames, dtype=proj_aug.dtype)
    d1, q = proj_aug.shape
    proj_blk = jnp.einsum("gh,dq->gdhq", eye, proj_aug).reshape(
        g_frames * d1, g_frames * q
    )
    projT = proj_blk.T
    w2 = jnp.broadcast_to(
        jnp.swapaxes(conv_weights, 0, 1)[None],
        (g_frames,) + (q,) + conv_weights.shape[:1] + conv_weights.shape[2:],
    ).reshape(g_frames * q, conv_weights.shape[0], conv_weights.shape[2])
    return projT, w2


def _unfold_param_grads(dprojT, dw2, d: int, q: int, g_frames: int):
    """Fold kernel-operand gradients back onto the shared parameters —
    the manual mirror of autodiff through :func:`_fold_params`."""
    d1 = d + 1
    dproj_aug = jnp.einsum(
        "gqgd->dq", dprojT.reshape(g_frames, q, g_frames, d1)
    )
    dw = jnp.swapaxes(
        dw2.reshape(g_frames, q, dw2.shape[1], dw2.shape[2]).sum(0), 0, 1
    )
    return dproj_aug[:d], dproj_aug[d], dw


def fused_pne_conv_bwd(
    geo_t: jnp.ndarray,
    feat_g: jnp.ndarray,
    proj_axes: jnp.ndarray,
    proj_biases: jnp.ndarray,
    conv_weights: jnp.ndarray,
    gout: jnp.ndarray,
    g_frames: int,
    act: str = "gelu",
    tile_m: int = 256,
    compute_dtype: Optional[str] = None,
):
    """Direct backward-kernel call for callers owning their own VJP.

    Same math as autodiff through :func:`fused_pne_conv` (the backward
    Pallas kernel + the parameter-operand fold-back), WITHOUT re-running
    the forward kernel — the lean-VJP conv path uses this so disabling
    layer remat does not cost a forward recompute.

    Args match :func:`fused_pne_conv`; ``gout`` is ``[B, M, G, O]`` f32.
    Returns ``(dfeat_g [B, M, E, C], dproj_axes, dproj_biases, dconv_w)``
    with parameter grads summed over the batch.
    """
    d, q = proj_axes.shape
    e, c = feat_g.shape[2], feat_g.shape[3]
    o = conv_weights.shape[2]
    tm = _tile_for(tile_m, e, c, o, d, g_frames, q, compute_dtype)
    cdt_name = (
        None if compute_dtype is None else jnp.dtype(compute_dtype).name
    )
    projT, w2 = _fold_params(proj_axes, proj_biases, conv_weights, g_frames)
    gout_k = jnp.swapaxes(gout, 1, 2)  # [B, G, M, O] kernel layout

    def one(gt, fg, go):
        _, dfeat, dprojT, dw2 = _fused_single_bwd(
            act, g_frames, tm, cdt_name, (gt, fg, projT, w2), go
        )
        return dfeat, dprojT, dw2

    dfeat_g, dprojT, dw2 = jax.vmap(one)(geo_t, feat_g, gout_k)
    dpa, dpb, dw = _unfold_param_grads(
        dprojT.sum(0), dw2.sum(0), d, q, g_frames
    )
    return dfeat_g, dpa, dpb, dw


def fused_pne_conv(
    geo_t: jnp.ndarray,
    feat_g: jnp.ndarray,
    proj_axes: jnp.ndarray,
    proj_biases: jnp.ndarray,
    conv_weights: jnp.ndarray,
    g_frames: int,
    act: str = "gelu",
    tile_m: int = 256,
    compute_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """Fused PNE conv over a batch (standard or rot-equivariant).

    Args:
      geo_t: ``[B, G*(D+1), M*E]`` transposed per-edge PNE inputs; rows
        are (g, d) with each g-block's LAST row all-ones (the bias rides
        it), lanes are edges in (m, e) order.  Offsets are UNSCALED —
        fold ``norm_neigh_dist`` into ``proj_axes`` before calling.
        Stop-gradiented geometry; may be bf16.
      feat_g: ``[B, M, E, C]`` gathered neighbor features with invalid
        edges zeroed (the zero rows also zero their pne/grad contribution,
        so the kernel needs no mask input).  May be bf16 — its gradient
        comes back in the same dtype (accumulated in f32 by the caller's
        scatter).
      proj_axes: ``[D, Q]`` (pre-scaled); proj_biases: ``[Q]``;
        conv_weights ``[C, Q, O]``.
      g_frames: number of out-frames G folded into geo_t's rows.
    Returns:
      ``[B, M, G, O]`` f32, un-normalised (apply ``norm_num_neighs [/ F]``
      outside).
    """
    d, q = proj_axes.shape
    tile_m = _tile_for(
        tile_m, feat_g.shape[2], feat_g.shape[3], conv_weights.shape[2],
        d, g_frames, q, compute_dtype,
    )
    # Kernel operands built XLA-side, so autodiff folds the gradients
    # back onto the shared parameters.
    projT, w2 = _fold_params(proj_axes, proj_biases, conv_weights, g_frames)

    # custom_vjp functions reject keyword args: bind the static tail
    # positionally.
    def fn(gt, fg, pt, ww):
        return _fused_single(gt, fg, pt, ww, act, g_frames, tile_m, compute_dtype)

    out = jax.vmap(fn, in_axes=(0, 0, None, None))(geo_t, feat_g, projT, w2)
    return jnp.swapaxes(out, 1, 2)  # [B, G, M, O] -> [B, M, G, O]
