"""One-shot runtime warnings for silent config interactions
(VERDICT r3 weak #6): lean_vjp dropped under the 'sorted' backward mode,
and a cached packed-geometry dtype mismatch forcing a per-layer rebuild.
"""
import jax
import jax.numpy as jnp
import pytest

import se3conv3d_tpu.ops.pallas.fused_equiv as fe
from se3conv3d_tpu.core.neighborhoods import Neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.ops import pne_conv as ops

fe.FUSED_INTERPRET = True

B, N, K, F, Q, C, O = 1, 32, 4, 1, 8, 6, 5


def _setup(key):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    pts = jax.random.uniform(k1, (B, N, 3))
    frames = random_rotations(k2, B * N * F).reshape(B, N, F, 3, 3)
    pc = PointCloud(positions=pts, mask=jnp.ones((B, N), bool), frames=frames)
    neigh = Neighborhood(
        idx=jax.random.randint(k3, (B, N, K), 0, N),
        mask=jnp.ones((B, N, K), bool),
        query_mask=jnp.ones((B, N), bool),
    )
    feats = jax.random.normal(k4, (B, N, F, C))
    pa = jax.random.normal(k5, (9, Q)) * 0.3
    pb = jnp.zeros((Q,))
    w = jax.random.normal(k6, (C, Q, O)) * 0.1
    return pc, neigh, feats, pa, pb, w


def test_lean_vjp_dropped_under_sorted_warns(monkeypatch):
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(0))
    monkeypatch.setattr(ops, "BWD_SCATTER_MODE", "sorted")
    ops._WARNED.clear()
    with pytest.warns(RuntimeWarning, match="lean_vjp is ignored"):
        ops.fused_equiv_conv(
            pc, pc, neigh, feats, pa, pb, w,
            jnp.asarray(2.0), jnp.asarray(0.25),
            tile_m=32, lean_vjp=True,
        )
    # one-shot: a second identical call stays silent
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        ops.fused_equiv_conv(
            pc, pc, neigh, feats, pa, pb, w,
            jnp.asarray(2.0), jnp.asarray(0.25),
            tile_m=32, lean_vjp=True,
        )


def test_cached_geometry_dtype_mismatch_warns():
    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(1))
    geo_f32 = ops.packed_equiv_geometry(pc, pc, neigh, None)
    assert geo_f32.dtype == jnp.float32
    neigh_cached = neigh.replace(equiv_geo_t=geo_f32)
    ops._WARNED.clear()
    with pytest.warns(RuntimeWarning, match="cached packed geometry"):
        ops.fused_equiv_conv(
            pc, pc, neigh_cached, feats, pa, pb, w,
            jnp.asarray(2.0), jnp.asarray(0.25),
            tile_m=32, compute_dtype="bfloat16",
        )


def test_matching_cached_dtype_stays_silent():
    import warnings as _w

    pc, neigh, feats, pa, pb, w = _setup(jax.random.PRNGKey(2))
    geo_f32 = ops.packed_equiv_geometry(pc, pc, neigh, None)
    neigh_cached = neigh.replace(equiv_geo_t=geo_f32)
    ops._WARNED.clear()
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        ops.fused_equiv_conv(
            pc, pc, neigh_cached, feats, pa, pb, w,
            jnp.asarray(2.0), jnp.asarray(0.25), tile_m=32,
        )
