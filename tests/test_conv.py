"""PNE convolution ops and layers vs. loop oracles + equivariance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3conv3d_tpu.core import frames as FR
from se3conv3d_tpu.core import neighborhoods as NB
from se3conv3d_tpu.core import rotation as R
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.nn.conv import PNEConv
from se3conv3d_tpu.ops import pne_conv as ops


def _cloud(key, b=1, n=32, frames=None):
    pts = jax.random.normal(key, (b, n, 3))
    return PointCloud(positions=pts, mask=jnp.ones((b, n), bool), frames=frames)


def _np_gelu(x):
    from scipy.stats import norm as _n  # noqa

    return x * 0.5 * (1.0 + np.vectorize(np.math.erf if hasattr(np.math, "erf") else None)(x))


def test_basis_conv_matches_loop_oracle():
    """Standard conv vs. an edge-loop oracle implementing the reference
    semantics (feat_basis_proj.cu accumulation + einsum('nik,iko->no'))."""
    key = jax.random.PRNGKey(0)
    pc = _cloud(key, 1, 24)
    nb = NB.ball_query_neighborhood(pc, pc, radius=0.8, k=12)
    cb, ci, co = 8, 5, 7
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 24, ci))
    pne = jax.random.normal(jax.random.PRNGKey(2), (1, 24, 12, cb))
    pne = pne * nb.mask[..., None]
    w = jax.random.normal(jax.random.PRNGKey(3), (ci, cb, co))
    norm = jnp.asarray(0.37)

    out = ops.basis_conv(pne, feats, nb, w, norm)

    f = np.asarray(feats[0])
    p = np.asarray(pne[0])
    idx = np.asarray(nb.idx[0])
    mask = np.asarray(nb.mask[0])
    wn = np.asarray(w)
    expected = np.zeros((24, co))
    for m in range(24):
        basis = np.zeros((ci, cb))
        for k in range(12):
            if mask[m, k]:
                basis += np.outer(f[idx[m, k]], p[m, k])
        expected[m] = np.einsum("cq,cqo->o", basis, wn) * 0.37
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-4)


def test_equiv_basis_conv_matches_loop_oracle():
    key = jax.random.PRNGKey(4)
    n, k, g, f, cb, ci, co = 16, 6, 2, 2, 4, 3, 5
    pc = _cloud(key, 1, n)
    nb = NB.knn_neighborhood(pc, pc, k=k)
    feats = jax.random.normal(jax.random.PRNGKey(5), (1, n, f, ci))
    pne = jax.random.normal(jax.random.PRNGKey(6), (1, n, k, g, f, cb))
    pne = pne * nb.mask[:, :, :, None, None, None]
    w = jax.random.normal(jax.random.PRNGKey(7), (ci, cb, co))
    out = ops.equiv_basis_conv(pne, feats, nb, w, jnp.asarray(1.0))

    fe = np.asarray(feats[0])
    p = np.asarray(pne[0])
    idx = np.asarray(nb.idx[0])
    mask = np.asarray(nb.mask[0])
    expected = np.zeros((n, g, co))
    for m in range(n):
        for gg in range(g):
            basis = np.zeros((ci, cb))
            for kk in range(k):
                if mask[m, kk]:
                    for ff in range(f):
                        basis += np.outer(fe[idx[m, kk], ff], p[m, kk, gg, ff])
            expected[m, gg] = np.einsum("cq,cqo->o", basis, np.asarray(w)) / f
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-4)


def test_equiv_geometry_shapes_and_content():
    key = jax.random.PRNGKey(8)
    n, k, g = 12, 4, 2
    frames = R.random_rotations(key, n * g).reshape(1, n, g, 3, 3)
    pc = _cloud(jax.random.PRNGKey(9), 1, n, frames=frames)
    nb = NB.knn_neighborhood(pc, pc, k=k)
    geo = ops.equiv_geometry(pc, pc, nb, jnp.asarray(2.0), "6D")
    assert geo.shape == (1, n, k, g, g, 9)
    # check one entry by hand
    m, kk, gg, ff = 3, 1, 0, 1
    src = np.asarray(pc.positions[0, np.asarray(nb.idx[0, m, kk])])
    ctr = np.asarray(pc.positions[0, m])
    rel = (src - ctr) * 2.0
    fo = np.asarray(frames[0, m, gg])
    fi = np.asarray(frames[0, np.asarray(nb.idx[0, m, kk]), ff])
    expected_local = rel @ fo
    expected_rot = (fo.T @ fi)[:2, :].reshape(6)
    np.testing.assert_allclose(np.asarray(geo[0, m, kk, gg, ff, :3]), expected_local, atol=1e-5)
    np.testing.assert_allclose(np.asarray(geo[0, m, kk, gg, ff, 3:]), expected_rot, atol=1e-5)


def _init_conv(conv, pc_in, pc_out, feats, nb):
    variables = conv.init(
        {"params": jax.random.PRNGKey(0)}, pc_in, pc_out, feats, nb
    )
    # emulate one calibration pass
    _, updates = conv.apply(
        variables, pc_in, pc_out, feats, nb, calibrate=True, mutable=["calib"]
    )
    variables = {**variables, "calib": updates["calib"]}
    return variables


def test_conv_layer_gradients_flow_to_params_only():
    pc = _cloud(jax.random.PRNGKey(10), 1, 20)
    nb = NB.ball_query_neighborhood(pc, pc, radius=1.0, k=8)
    conv = PNEConv(in_features=4, out_features=6, num_basis=8, pne_type="mlp_gelu")
    feats = jax.random.normal(jax.random.PRNGKey(11), (1, 20, 4))
    variables = _init_conv(conv, pc, pc, feats, nb)

    def loss(params, feats):
        out = conv.apply({**variables, "params": params}, pc, pc, feats, nb)
        return jnp.sum(out**2)

    grads, fgrads = jax.grad(loss, argnums=(0, 1))(variables["params"], feats)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in flat)
    assert any(jnp.any(g != 0) for g in flat)
    assert jnp.any(fgrads != 0)  # features do get gradients (needed for stacking)


def test_conv_gradient_against_finite_differences():
    pc = _cloud(jax.random.PRNGKey(12), 1, 10)
    nb = NB.knn_neighborhood(pc, pc, k=4)
    conv = PNEConv(in_features=3, out_features=2, num_basis=4, pne_type="mlp_linear")
    feats = jax.random.normal(jax.random.PRNGKey(13), (1, 10, 3))
    variables = _init_conv(conv, pc, pc, feats, nb)

    def loss(pa):
        out = conv.apply(
            {**variables, "params": {**variables["params"], "proj_axes": pa}},
            pc, pc, feats, nb,
        )
        return jnp.sum(jnp.sin(out))

    pa = variables["params"]["proj_axes"]
    g = jax.grad(loss)(pa)
    eps = 1e-3
    for i, j in [(0, 0), (1, 2), (2, 3)]:
        pa_p = pa.at[i, j].add(eps)
        pa_m = pa.at[i, j].add(-eps)
        fd = (loss(pa_p) - loss(pa_m)) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=5e-2, atol=1e-3)


def test_equivariant_conv_invariance_under_rotation():
    """The defining property: frame-pooled equivariant conv outputs are
    invariant when cloud AND frames are rotated together."""
    key = jax.random.PRNGKey(14)
    n, f = 24, 2
    pos = jax.random.normal(key, (1, n, 3))
    frames = R.random_rotations(jax.random.PRNGKey(15), n * f).reshape(1, n, f, 3, 3)
    pc = PointCloud(positions=pos, mask=jnp.ones((1, n), bool), frames=frames)
    nb = NB.knn_neighborhood(pc, pc, k=8)
    feats = jax.random.normal(jax.random.PRNGKey(16), (1, n, f, 5))
    conv = PNEConv(
        in_features=5, out_features=4, num_basis=8, pne_type="mlp_gelu",
        equivariant=True,
    )
    variables = _init_conv(conv, pc, pc, feats, nb)
    out = conv.apply(variables, pc, pc, feats, nb)

    rot = R.random_rotations(jax.random.PRNGKey(17), 1)[0]
    pos_r = jnp.einsum("bnd,ed->bne", pos, rot)
    frames_r = jnp.einsum("ed,bnfdc->bnfec", rot, frames)
    pc_r = PointCloud(positions=pos_r, mask=pc.mask, frames=frames_r)
    # identical neighbor indices (rotation-invariant distances)
    out_r = conv.apply(variables, pc_r, pc_r, feats, nb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-3)


def test_kp_conv_runs():
    pc = _cloud(jax.random.PRNGKey(18), 1, 16)
    nb = NB.ball_query_neighborhood(pc, pc, radius=1.0, k=8)
    for t in ["kp_gauss", "kp_linear", "kp_box", "kp_gauss_double"]:
        conv = PNEConv(in_features=3, out_features=4, num_basis=8, pne_type=t)
        feats = jax.random.normal(jax.random.PRNGKey(19), (1, 16, 3))
        variables = _init_conv(conv, pc, pc, feats, nb)
        out = conv.apply(variables, pc, pc, feats, nb)
        assert out.shape == (1, 16, 4)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_max_aggregation_conv():
    pc = _cloud(jax.random.PRNGKey(20), 1, 16)
    nb = NB.ball_query_neighborhood(pc, pc, radius=1.0, k=8)
    conv = PNEConv(
        in_features=3, out_features=4, num_basis=8, pne_type="mlp_gelu",
        aggregation="max",
    )
    feats = jax.random.normal(jax.random.PRNGKey(21), (1, 16, 3))
    variables = _init_conv(conv, pc, pc, feats, nb)
    out = conv.apply(variables, pc, pc, feats, nb)
    assert out.shape == (1, 16, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_calibration_ema():
    pc = _cloud(jax.random.PRNGKey(22), 1, 16)
    nb = NB.ball_query_neighborhood(pc, pc, radius=0.5, k=8)
    conv = PNEConv(in_features=3, out_features=4, num_basis=8, pne_type="mlp_gelu")
    feats = jnp.ones((1, 16, 3))
    variables = conv.init({"params": jax.random.PRNGKey(0)}, pc, pc, feats, nb)
    calib = variables["calib"]
    # Non-degenerate default: 1.0 (not the reference's 0 — see conv.py).
    assert float(calib["norm_neigh_dist"]) == 1.0
    assert not bool(calib["initialized"])
    _, upd = conv.apply(variables, pc, pc, feats, nb, calibrate=True, mutable=["calib"])
    # First calibration step direct-sets to the observed value.
    np.testing.assert_allclose(
        float(upd["calib"]["norm_neigh_dist"]), 1 / 0.5, rtol=1e-5
    )
    edges = float(jnp.sum(nb.mask))
    np.testing.assert_allclose(
        float(upd["calib"]["norm_num_neighs"]), 16.0 / edges, rtol=1e-5
    )
    # Second step applies the reference's 0.9/0.1 EMA (IConvLayer.py:91-97);
    # same inputs -> values unchanged.
    _, upd2 = conv.apply(
        {**variables, "calib": upd["calib"]}, pc, pc, feats, nb,
        calibrate=True, mutable=["calib"],
    )
    np.testing.assert_allclose(
        float(upd2["calib"]["norm_neigh_dist"]), 1 / 0.5, rtol=1e-5
    )


def test_fused_o_chunking_matches_unchunked(monkeypatch):
    """Wide convs split the O axis into VMEM-sized fused-kernel calls;
    chunked dispatch must match the one-call result exactly (fwd + grads).
    The cutoff is monkeypatched tiny so small shapes exercise the split."""
    import se3conv3d_tpu.nn.conv as conv_mod

    key = jax.random.PRNGKey(30)
    n, f, ci, co = 16, 2, 4, 6
    pos = jax.random.normal(key, (1, n, 3))
    frames = R.random_rotations(jax.random.PRNGKey(31), n * f).reshape(
        1, n, f, 3, 3
    )
    pc = PointCloud(positions=pos, mask=jnp.ones((1, n), bool), frames=frames)
    nb = NB.knn_neighborhood(pc, pc, k=6)
    feats = jax.random.normal(jax.random.PRNGKey(32), (1, n, f, ci))
    conv = PNEConv(
        in_features=ci, out_features=co, num_basis=8, pne_type="mlp_gelu",
        equivariant=True, use_fused=True,
    )
    variables = _init_conv(conv, pc, pc, feats, nb)

    calib = variables["calib"]

    def loss(params, x):
        return jnp.sum(
            conv.apply({"params": params, "calib": calib}, pc, pc, x, nb) ** 2
        )

    out_1 = conv.apply(variables, pc, pc, feats, nb)
    g_1 = jax.grad(loss, argnums=(0, 1))(variables["params"], feats)

    # force chunking: cutoff below ci*num_basis*co = 192 elements
    monkeypatch.setattr(conv_mod, "FUSED_WEIGHT_VMEM_CUTOFF", 8 * ci)
    out_c = conv.apply(variables, pc, pc, feats, nb)
    g_c = jax.grad(loss, argnums=(0, 1))(variables["params"], feats)

    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_1), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
