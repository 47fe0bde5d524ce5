"""Parity of the fused kernel-point (kp_*) conv vs the XLA einsum path.

Interpreter mode on CPU (conftest forces the CPU backend).  Oracle:
``kp_pne`` + mask + ``basis_conv`` — themselves written against the
reference semantics (``custom_ops/PNE.py:64-163``,
``feat_basis_proj.cu:24-185``).  The fused path computes the correlation
weights XLA-side into the kernel's packed geometry rows and runs the
kernel with ``act='linear'`` (``ops/pne_conv.py:fused_kp_conv``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import se3conv3d_tpu.ops.pallas.fused_equiv as fe
from se3conv3d_tpu.core.neighborhoods import knn_neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.nn.conv import PNEConv, _kernel_points, fused_dispatch
from se3conv3d_tpu.ops import pne_conv as ops

fe.FUSED_INTERPRET = True

B, N, K, Q, C, O = 2, 96, 8, 16, 24, 20


def _setup(key, pne_type="kp_gauss", mask_tail=7):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    pts = jax.random.uniform(k1, (B, N, 3)) * 2.0
    mask = jnp.ones((B, N), bool)
    if mask_tail:
        mask = mask.at[:, N - mask_tail:].set(False)
    pc = PointCloud(positions=pts, mask=mask)
    neigh = knn_neighborhood(pc, pc, K)
    kp, sigma = _kernel_points(pne_type)
    feats = jax.random.normal(k2, (B, N, C))
    proj_axes = jax.random.normal(k3, (kp.shape[0], Q)) * 0.3
    proj_biases = jax.random.normal(k4, (Q,)) * 0.1
    weights = jax.random.normal(k5, (C, Q, O)) * 0.1
    return pc, neigh, kp, sigma, feats, proj_axes, proj_biases, weights


def _xla_kp(pc, neigh, kp, sigma, corr, feats, pa, pb, w, nd, nn):
    rel = ops.relative_offsets(pc, pc, neigh, nd)
    pne = ops.kp_pne(rel, kp, sigma, corr, pa, pb) * neigh.mask[..., None]
    return ops.basis_conv(pne, feats, neigh, w, nn)


@pytest.mark.parametrize("corr", ["gauss", "linear", "box"])
def test_forward_matches_xla_path(corr):
    pc, neigh, kp, sigma, feats, pa, pb, w = _setup(
        jax.random.PRNGKey(0), f"kp_{corr}"
    )
    nd, nn = jnp.asarray(1.7), jnp.asarray(0.11)
    ref = _xla_kp(pc, neigh, kp, sigma, corr, feats, pa, pb, w, nd, nn)
    got = ops.fused_kp_conv(
        pc, pc, neigh, feats, kp, sigma, corr, pa, pb, w, nd, nn, tile_m=32
    )
    assert got.shape == ref.shape == (B, N, O)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=5e-5
    )


def test_forward_matches_xla_path_chunked():
    """m_chunk below M exercises the lax.scan chunking."""
    pc, neigh, kp, sigma, feats, pa, pb, w = _setup(jax.random.PRNGKey(3))
    nd, nn = jnp.asarray(1.7), jnp.asarray(0.11)
    ref = _xla_kp(pc, neigh, kp, sigma, "gauss", feats, pa, pb, w, nd, nn)
    got = ops.fused_kp_conv(
        pc, pc, neigh, feats, kp, sigma, "gauss", pa, pb, w, nd, nn,
        tile_m=32, m_chunk=32,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=5e-5
    )


@pytest.mark.parametrize("corr", ["gauss", "linear", "box"])
def test_gradients_match_xla_path(corr):
    pc, neigh, kp, sigma, feats, pa, pb, w = _setup(
        jax.random.PRNGKey(1), f"kp_{corr}"
    )
    nd, nn = jnp.asarray(1.7), jnp.asarray(0.11)

    def loss(fn, params):
        feats_, pa_, pb_, w_ = params
        out = fn(feats_, pa_, pb_, w_)
        return jnp.sum(out * jnp.cos(out))

    params = (feats, pa, pb, w)
    g_ref = jax.grad(
        lambda p: loss(
            lambda f_, a_, b_, w_: _xla_kp(
                pc, neigh, kp, sigma, corr, f_, a_, b_, w_, nd, nn
            ),
            p,
        )
    )(params)
    g_fus = jax.grad(
        lambda p: loss(
            lambda f_, a_, b_, w_: ops.fused_kp_conv(
                pc, pc, neigh, f_, kp, sigma, corr, a_, b_, w_, nd, nn,
                tile_m=32,
            ),
            p,
        )
    )(params)
    for a, b, name in zip(g_ref, g_fus, ["feats", "proj", "bias", "w"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_dispatch_accepts_kp():
    assert fused_dispatch("kp_gauss", "add", False, "6D", True)
    assert fused_dispatch("kp_linear_double", "add", False, "6D", True)
    assert fused_dispatch("kp_box", "add", False, "6D", True)
    # equivariant kp stays off the fused path (and off the layer entirely,
    # like the reference)
    assert not fused_dispatch("kp_gauss", "add", True, "6D", True)
    assert not fused_dispatch("kp_gauss", "max", False, "6D", True)


def test_kp_sorted_backward_matches_scatter(monkeypatch):
    """kp conv under SE3CONV_BWD_MODE=sorted: the sorted-edge gather VJP
    must produce the same gradients as the default scatter mode."""
    pc, neigh, kp, sigma, feats, pa, pb, w = _setup(jax.random.PRNGKey(5))
    nd, nn = jnp.asarray(1.7), jnp.asarray(0.11)

    def loss(params):
        feats_, pa_, pb_, w_ = params
        out = ops.fused_kp_conv(
            pc, pc, neigh, feats_, kp, sigma, "gauss", pa_, pb_, w_,
            nd, nn, tile_m=32,
        )
        return jnp.sum(out * jnp.cos(out))

    params = (feats, pa, pb, w)
    g_scatter = jax.grad(loss)(params)
    monkeypatch.setattr(ops, "BWD_SCATTER_MODE", "sorted")
    g_sorted = jax.grad(loss)(params)
    for a, b, name in zip(
        g_scatter, g_sorted, ["feats", "proj", "bias", "w"]
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=f"sorted-mode grad mismatch: {name}",
        )


# NOTE: no bf16 execution test here — the CPU backend cannot execute
# BF16xBF16=F32 dots even in interpret mode ("Unsupported element type
# for DotThunk"); the bf16 compute path is exercised on-chip (bench.py).


@pytest.mark.parametrize("pne_type", ["kp_gauss", "kp_linear_double"])
def test_pneconv_layer_fused_matches_xla(pne_type):
    """Full layer: PNEConv(use_fused=True, interpret) == use_fused=False."""
    pc, neigh, _, _, feats, _, _, _ = _setup(jax.random.PRNGKey(2), pne_type)
    common = dict(
        in_features=C, out_features=O, num_basis=Q, pne_type=pne_type
    )
    conv_x = PNEConv(use_fused=False, **common)
    conv_f = PNEConv(use_fused=True, **common)
    variables = conv_x.init(
        jax.random.PRNGKey(5), pc, pc, feats, neigh
    )
    ref = conv_x.apply(variables, pc, pc, feats, neigh)
    got = conv_f.apply(variables, pc, pc, feats, neigh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=5e-5
    )
