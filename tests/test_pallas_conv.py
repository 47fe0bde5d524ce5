"""Pallas fused conv kernel vs. the XLA einsum reference path.

Runs in interpreter mode on CPU (real Mosaic lowering is exercised on the
TPU by bench.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import se3conv3d_tpu.ops.pallas.fused_conv as fc
from se3conv3d_tpu.core.neighborhoods import knn_neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.ops import pne_conv as ops


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(fc, "FUSED_CONV_INTERPRET", True)


def _setup(key, b=1, m=40, k=8, c=6, q=4, o=5, d=3):
    ks = jax.random.split(key, 6)
    geo = jax.random.normal(ks[0], (b, m, k, d))
    feat = jax.random.normal(ks[1], (b, m, k, c))
    mask = jax.random.uniform(ks[2], (b, m, k)) > 0.3
    a = jax.random.normal(ks[3], (d, q)) * 0.5
    bias = jax.random.normal(ks[4], (q,)) * 0.1
    w = jax.random.normal(ks[5], (c, q, o)) * 0.2
    return geo, feat, mask, a, bias, w


def _xla_reference(geo, feat, mask, a, bias, w, act=jax.nn.gelu):
    pne = act(geo @ a + bias) * mask[..., None]
    basis = jnp.einsum("bmkc,bmkq->bmcq", feat, pne)
    return jnp.einsum("bmcq,cqo->bmo", basis, w)


def test_fused_forward_matches_xla():
    geo, feat, mask, a, bias, w = _setup(jax.random.PRNGKey(0))
    out = fc.fused_basis_conv(geo, feat, mask, a, bias, w, act="gelu", tile_m=16)
    ref = _xla_reference(geo, feat, mask, a, bias, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_forward_nondivisible_tile():
    geo, feat, mask, a, bias, w = _setup(jax.random.PRNGKey(1), m=37)
    out = fc.fused_basis_conv(geo, feat, mask, a, bias, w, act="relu", tile_m=16)
    ref = _xla_reference(geo, feat, mask, a, bias, w, act=jax.nn.relu)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_gradients_match_xla():
    geo, feat, mask, a, bias, w = _setup(jax.random.PRNGKey(2), m=32)

    def loss_fused(params):
        a_, b_, w_, f_ = params
        out = fc.fused_basis_conv(geo, f_, mask, a_, b_, w_, act="gelu", tile_m=16)
        return jnp.sum(jnp.sin(out))

    def loss_ref(params):
        a_, b_, w_, f_ = params
        return jnp.sum(jnp.sin(_xla_reference(geo, f_, mask, a_, b_, w_)))

    params = (a, bias, w, feat)
    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_ref)(params)
    for gf, gr, name in zip(g_fused, g_ref, ["dA", "db", "dW", "dfeat"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-4, err_msg=name
        )


def test_fused_equiv_matches_xla_equiv():
    key = jax.random.PRNGKey(3)
    b, n, k, g, f, q, c, o = 1, 24, 6, 2, 2, 4, 3, 5
    ks = jax.random.split(key, 5)
    pts = jax.random.normal(ks[0], (b, n, 3))
    pc = PointCloud(positions=pts, mask=jnp.ones((b, n), bool))
    frames = jax.vmap(
        lambda k_: jax.vmap(lambda kk: jnp.linalg.qr(
            jax.random.normal(kk, (3, 3)))[0])(jax.random.split(k_, n * g)).reshape(
            n, g, 3, 3)
    )(jax.random.split(ks[1], b))
    pc = pc.with_frames(frames)
    nb = knn_neighborhood(pc, pc, k)
    feats = jax.random.normal(ks[2], (b, n, f, c))
    # Reuse frames as in-frames too (g == f here).
    a = jax.random.normal(ks[3], (9, q)) * 0.5
    bias = jnp.zeros((q,))
    w = jax.random.normal(ks[4], (c, q, o)) * 0.2

    geo = ops.equiv_geometry(pc, pc, nb, jnp.asarray(1.7), "6D")
    pne = ops.linear_pne(geo, a, bias, jax.nn.gelu)
    pne = pne * nb.mask[:, :, :, None, None, None]
    ref = ops.equiv_basis_conv(pne, feats, nb, w, jnp.asarray(1.0))
    ref = ref * f  # undo the /F_in of the reference op

    gathered = jax.vmap(lambda v, i: v[i])(feats, nb.idx)
    out = fc.fused_equiv_basis_conv(
        geo, gathered, nb.mask, a, bias, w, act="gelu", tile_m=8
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
