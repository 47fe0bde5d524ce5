"""Parity of the production fused Pallas conv vs the XLA einsum path.

Interpreter mode on CPU (conftest forces the CPU backend); the same kernel
compiles on Mosaic on the real chip (experiments/bench_fused.py).  Oracle:
``linear_pne`` + mask + ``equiv_basis_conv`` / ``basis_conv`` — themselves
oracle-tested against the reference semantics in tests/test_conv.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import se3conv3d_tpu.ops.pallas.fused_equiv as fe
from se3conv3d_tpu.core.frames import pca_frames, shuffle_and_select_frames
from se3conv3d_tpu.core.neighborhoods import Neighborhood, knn_neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.ops import pne_conv as ops

fe.FUSED_INTERPRET = True

B, N, K, F, Q, C, O = 2, 96, 8, 2, 16, 24, 20


def _setup(key, mask_tail=7):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    pts = jax.random.uniform(k1, (B, N, 3)) * 2.0
    mask = jnp.ones((B, N), bool)
    if mask_tail:
        mask = mask.at[:, N - mask_tail:].set(False)
    pc = PointCloud(positions=pts, mask=mask)
    neigh = knn_neighborhood(pc, pc, K)
    cand = pca_frames(pts, neigh.idx, neigh.mask)
    frames = shuffle_and_select_frames(k2, cand, F)
    pc = PointCloud(positions=pts, mask=mask, frames=frames)
    feats = jax.random.normal(k3, (B, N, F, C))
    proj_axes = jax.random.normal(k4, (9, Q)) * 0.3
    proj_biases = jax.random.normal(k5, (Q,)) * 0.1
    weights = jax.random.normal(k6, (C, Q, O)) * 0.1
    return pc, neigh, feats, proj_axes, proj_biases, weights


def _xla_equiv(pc, neigh, feats, pa, pb, w, norm_dist, norm_n):
    geo = ops.equiv_geometry(pc, pc, neigh, norm_dist, "6D")
    pne = ops.linear_pne(geo, pa, pb, ops.pne_activation("mlp_gelu"))
    pne = pne * neigh.mask[:, :, :, None, None, None]
    return ops.equiv_basis_conv(pne, feats, neigh, w, norm_n)


def _fused_equiv(pc, neigh, feats, pa, pb, w, norm_dist, norm_n):
    return ops.fused_equiv_conv(
        pc, pc, neigh, feats, pa, pb, w, norm_dist, norm_n, tile_m=32
    )


def test_forward_matches_xla_path():
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(0))
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.11)
    ref = _xla_equiv(pc, neigh, feats, pa, pb, w, nd, nn)
    got = _fused_equiv(pc, neigh, feats, pa, pb, w, nd, nn)
    assert got.shape == ref.shape == (B, N, F, O)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=5e-5)


def test_gradients_match_xla_path():
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(1))
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.11)

    def loss(fn, params):
        feats_, pa_, pb_, w_ = params
        out = fn(pc, neigh, feats_, pa_, pb_, w_, nd, nn)
        return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

    params = (feats, pa, pb, w)
    g_ref = jax.grad(lambda p: loss(_xla_equiv, p))(params)
    g_fus = jax.grad(lambda p: loss(_fused_equiv, p))(params)
    for a, b, name in zip(g_ref, g_fus, ["feats", "proj", "bias", "w"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_standard_conv_matches_xla_path():
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(2))
    feats1 = feats[:, :, 0, :]  # [B, N, C]
    pa3 = pa[:3]  # [3, Q]
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.13)

    rel = ops.relative_offsets(pc, pc, neigh, nd)
    pne = ops.linear_pne(rel, pa3, pb, ops.pne_activation("mlp_gelu")) * neigh.mask[..., None]
    ref = ops.basis_conv(pne, feats1, neigh, w, nn)

    got = ops.fused_conv(pc, pc, neigh, feats1, pa3, pb, w, nd, nn, tile_m=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=5e-5)


def test_ragged_m_padding():
    """M not a multiple of tile_m: padded rows must not perturb results."""
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(3))
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.11)
    ref = _xla_equiv(pc, neigh, feats, pa, pb, w, nd, nn)
    got = ops.fused_equiv_conv(
        pc, pc, neigh, feats, pa, pb, w, nd, nn, tile_m=64
    )  # 96 % 64 != 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=5e-5)


@pytest.mark.parametrize("g_frames", [1, 2])
def test_single_frame_path(g_frames):
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(4))
    if g_frames == 1:
        frames1 = pc.frames[:, :, :1]
        pc = PointCloud(positions=pc.positions, mask=pc.mask, frames=frames1)
        feats = feats[:, :, :1]
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.11)
    ref = _xla_equiv(pc, neigh, feats, pa, pb, w, nd, nn)
    got = _fused_equiv(pc, neigh, feats, pa, pb, w, nd, nn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=5e-5)


def test_m_chunked_scan_path():
    """m_chunk < M exercises the lax.scan chunking; must match exactly."""
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(5))
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.11)
    ref = _xla_equiv(pc, neigh, feats, pa, pb, w, nd, nn)
    got = ops.fused_equiv_conv(
        pc, pc, neigh, feats, pa, pb, w, nd, nn, tile_m=32, m_chunk=32
    )  # N=96 -> 3 chunks
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=5e-5)

    def l_ref(p):
        out = _xla_equiv(pc, neigh, p[0], p[1], p[2], p[3], nd, nn)
        return jnp.sum(out**2)

    def l_chk(p):
        out = ops.fused_equiv_conv(
            pc, pc, neigh, p[0], p[1], p[2], p[3], nd, nn, tile_m=32, m_chunk=32
        )
        return jnp.sum(out**2)

    params = (feats, pa, pb, w)
    for a, b, name in zip(
        jax.grad(l_ref)(params), jax.grad(l_chk)(params), ["feats", "pa", "pb", "w"]
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-3,
            err_msg=f"chunked grad mismatch: {name}",
        )


def test_cached_packed_geometry_path():
    """Pre-attached equiv_geo_t must give identical results (the
    per-neighborhood cache shared by all convs on it)."""
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(6))
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.11)
    ref = _fused_equiv(pc, neigh, feats, pa, pb, w, nd, nn)
    geo_t = ops.packed_equiv_geometry(pc, pc, neigh)
    neigh_c = neigh.replace(equiv_geo_t=geo_t)
    got = ops.fused_equiv_conv(
        pc, pc, neigh_c, feats, pa, pb, w, nd, nn, tile_m=32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # chunked scan with the cache
    got_c = ops.fused_equiv_conv(
        pc, pc, neigh_c, feats, pa, pb, w, nd, nn, tile_m=32, m_chunk=32
    )
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref), atol=1e-5)
    # gradients: the uncached path's merged geometry+feature gather
    # (_gather_geo_feats) must backprop identically to the cached path's
    # separate feature gather
    def loss(n):
        def l(ft):
            o = ops.fused_equiv_conv(
                pc, pc, n, ft, pa, pb, w, nd, nn, tile_m=32
            )
            return jnp.sum(o * jnp.cos(o))
        return jax.grad(l)(feats)

    np.testing.assert_allclose(
        np.asarray(loss(neigh)), np.asarray(loss(neigh_c)), atol=1e-5
    )


def test_split_bf16_geo_table_reconstruction():
    """The bf16 compute path's gather table stores positions as a hi/lo
    bf16 pair (half the gather traffic); the reconstructed offsets must
    track the f32 table to ~16-bit accuracy even with large absolute
    coordinates (where plain bf16 positions would destroy offsets)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from se3conv3d_tpu.core import neighborhoods as NB
    from se3conv3d_tpu.core import rotation as R
    from se3conv3d_tpu.core.pointcloud import PointCloud
    from se3conv3d_tpu.ops import pne_conv as ops

    n, f, g = 40, 2, 2
    key = jax.random.PRNGKey(40)
    # large offset stresses the hi/lo split: offsets are ~0.1 on top of
    # coordinates ~50
    pos = jax.random.normal(key, (1, n, 3)) * 0.05 + 50.0
    frames = R.random_rotations(jax.random.PRNGKey(41), n * f).reshape(
        1, n, f, 3, 3
    )
    pc = PointCloud(positions=pos, mask=jnp.ones((1, n), bool), frames=frames)
    nb = NB.knn_neighborhood(pc, pc, k=6)

    geo_f32 = ops.packed_equiv_geometry(pc, pc, nb, None)
    geo_split = ops.packed_equiv_geometry(pc, pc, nb, "bfloat16")
    a = np.asarray(geo_f32, np.float32)
    b = np.asarray(geo_split, np.float32)
    # hi/lo reconstruction: |err| <~ |coord| * 2^-16 on offsets; rot rows
    # additionally carry the bf16 rounding of the frame values (~0.4% of
    # O(1) entries) — the same order as the f32-table bf16-geometry
    # path's final cast, i.e. the split adds no NEW error class
    np.testing.assert_allclose(a, b, atol=8e-3)
    # and a plain bf16-cast table would NOT pass at these coordinates:
    # bf16(50.x) loses ~0.125 absolute, comparable to the offsets
    bf16_pos_err = np.abs(
        np.asarray(pos) - np.asarray(pos).astype(jnp.bfloat16).astype(np.float32)
    ).max()
    assert bf16_pos_err > 0.05  # the failure mode the split avoids


@pytest.mark.parametrize("cached", [False, True])
@pytest.mark.parametrize("m_chunk", [4096, 32])
def test_lean_vjp_matches_autodiff_equiv(cached, m_chunk):
    """lean_vjp=True (inputs-only residuals, direct backward-kernel call)
    must reproduce the autodiff path's output AND gradients exactly, in
    both chunk layouts and with/without the cached packed geometry."""
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(7))
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.11)
    if cached:
        neigh = neigh.replace(equiv_geo_t=ops.packed_equiv_geometry(pc, pc, neigh))

    def loss(lean, p):
        out = ops.fused_equiv_conv(
            pc, pc, neigh, p[0], p[1], p[2], p[3], nd, nn,
            tile_m=32, m_chunk=m_chunk, lean_vjp=lean,
        )
        return jnp.sum(out * jnp.cos(out)), out

    params = (feats, pa, pb, w)
    (l_ref, out_ref), g_ref = jax.value_and_grad(
        lambda p: loss(False, p), has_aux=True)(params)
    (l_lean, out_lean), g_lean = jax.value_and_grad(
        lambda p: loss(True, p), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(out_lean), np.asarray(out_ref), atol=1e-6)
    for a, b, name in zip(g_ref, g_lean, ["feats", "pa", "pb", "w"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5,
            err_msg=f"lean grad mismatch: {name}",
        )


@pytest.mark.parametrize("m_chunk", [4096, 32])
def test_lean_vjp_matches_autodiff_standard(m_chunk):
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(8))
    feats1 = feats[:, :, 0, :]
    pa3 = pa[:3]
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.13)

    def loss(lean, p):
        out = ops.fused_conv(
            pc, pc, neigh, p[0], p[1], p[2], p[3], nd, nn,
            tile_m=32, m_chunk=m_chunk, lean_vjp=lean,
        )
        return jnp.sum(out * jnp.cos(out)), out

    params = (feats1, pa3, pb, w)
    (_, out_ref), g_ref = jax.value_and_grad(
        lambda p: loss(False, p), has_aux=True)(params)
    (_, out_lean), g_lean = jax.value_and_grad(
        lambda p: loss(True, p), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(out_lean), np.asarray(out_ref), atol=1e-6)
    for a, b, name in zip(g_ref, g_lean, ["feats", "pa", "pb", "w"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5,
            err_msg=f"lean std grad mismatch: {name}",
        )


def test_mismatched_cache_dtype_is_rebuilt():
    """A cached geo_t built for the OTHER compute dtype must be ignored
    (rebuilt locally), not consumed: a bf16 cache in an f32 conv would
    silently degrade the geometry; an f32 cache in a bf16 conv would feed
    the kernel a mismatched operand dtype.  Possible when conv and
    conv_blocks factories disagree on compute_dtype and share a
    self-neighborhood."""
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(8))
    nd, nn = jnp.asarray(3.0), jnp.asarray(0.11)
    ref_f32 = _fused_equiv(pc, neigh, feats, pa, pb, w, nd, nn)

    geo_bf16 = ops.packed_equiv_geometry(pc, pc, neigh, "bfloat16")
    neigh_bf16 = neigh.replace(equiv_geo_t=geo_bf16)
    # f32 request with a bf16 cache attached: identical to uncached f32
    got = ops.fused_equiv_conv(
        pc, pc, neigh_bf16, feats, pa, pb, w, nd, nn, tile_m=32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_f32), atol=1e-6)

    # bf16 request with an f32 cache attached: identical to uncached bf16
    geo_f32 = ops.packed_equiv_geometry(pc, pc, neigh, None)
    neigh_f32 = neigh.replace(equiv_geo_t=geo_f32)
    ref_bf16 = ops.fused_equiv_conv(
        pc, pc, neigh, feats, pa, pb, w, nd, nn, tile_m=32,
        compute_dtype=jnp.bfloat16,
    )
    got = ops.fused_equiv_conv(
        pc, pc, neigh_f32, feats, pa, pb, w, nd, nn, tile_m=32,
        compute_dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_bf16), atol=1e-6)
