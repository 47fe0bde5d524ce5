"""Runtime neighbor-cap certificate (VERDICT r4 #5).

The reference's ball query is unbounded (``store_neighbors.cu:129-176``,
``BQNeighborhood.py:20`` max_neighbors=0); our padded design keeps the
nearest ``max_neighbors``.  These tests pin the certificate that makes
that deviation loud: during calibration, ball queries report per-row
truncation, conv layers accumulate it into the ``trunc_frac`` calib stat,
and ``check_neighbor_caps`` warns on an under-capped config.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3conv3d_tpu.core.hierarchy import Hierarchy
from se3conv3d_tpu.core.neighborhoods import (
    ball_query_neighborhood,
    grid_ball_query_neighborhood,
)
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.models.seg_unet import FPNSegUNet
from se3conv3d_tpu.models.spec import ModelSpec
from se3conv3d_tpu.nn.conv import ConvFactory, check_neighbor_caps


def _cloud(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, scale, (1, n, 3)).astype(np.float32)
    return PointCloud(positions=jnp.asarray(pos), mask=jnp.ones((1, n), bool))


def _brute_counts(pc, radius):
    p = np.asarray(pc.positions[0])
    d2 = ((p[:, None] - p[None]) ** 2).sum(-1)
    return (d2 < radius**2).sum(1)  # self-inclusive, strict <


@pytest.mark.parametrize("grid", [False, True])
def test_trunc_flags_match_brute_force(grid):
    n = 9000 if grid else 500
    pc = _cloud(n, seed=1)
    radius, k = (0.06, 8) if grid else (0.2, 12)
    fn = grid_ball_query_neighborhood if grid else ball_query_neighborhood
    neigh = fn(pc, pc, radius, k, want_trunc=True)
    counts = _brute_counts(pc, radius)
    got = np.asarray(neigh.trunc[0])
    want = counts > k
    np.testing.assert_array_equal(got, want)
    assert want.any(), "test setup should actually truncate some rows"


def test_trunc_none_by_default():
    pc = _cloud(400, seed=2)
    neigh = ball_query_neighborhood(pc, pc, 0.2, 12)
    assert neigh.trunc is None


def _tiny_model(max_neighbors):
    fac = ConvFactory(num_basis=8, pne_type="mlp_gelu", remat=False)
    spec = ModelSpec(
        conv=fac,
        patch_num_levels=0,
        patch_num_features=(),
        num_blocks=(1,),
        num_features=(8,),
        radius_scale=2.0,
        radius_scale_blocks=2.0,
        radius_scale_dec=2.0,
        fpn_dec_feats=8,
        max_path_drop=0.0,
        max_neighbors=max_neighbors,
    )
    return FPNSegUNet(spec, 3, 4)


def _run_calibration(model, n=300, seed=3):
    pc = _cloud(n, seed=seed)
    hier = Hierarchy(levels=(pc,), maps=(), levels_radii=(0.25,))
    feats = jnp.ones((1, n, 3))
    variables = model.init(jax.random.PRNGKey(0), hier, feats, pc, train=False)
    _, upd = model.apply(
        variables, hier, feats, pc, train=False, calibrate=True,
        mutable=["calib"],
    )
    return jax.device_get(upd["calib"])


def test_undercapped_config_warns():
    # radius 0.5 over 300 points in a unit cube: typical ball occupancy
    # far above cap 4 -> every conv should flag truncation.
    calib = _run_calibration(_tiny_model(max_neighbors=4))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bad = check_neighbor_caps(calib)
    assert bad, "under-capped config must report truncating layers"
    assert any("neighbor cap" in str(x.message) for x in w)
    # every reported fraction is a real probability
    assert all(0.0 < f <= 1.0 for f in bad.values())


def test_wellcapped_config_silent():
    calib = _run_calibration(_tiny_model(max_neighbors=256))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bad = check_neighbor_caps(calib)
    assert bad == {}
    assert not w
