"""Grid subsampling vs. numpy voxel-grouping oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from se3conv3d_tpu.core.grid import build_grid_subsample, grid_subsample_cloud
from se3conv3d_tpu.core.pointcloud import PointCloud


def _cloud(key, b=2, n=100, valid=None):
    pts = jax.random.uniform(key, (b, n, 3)) * 2.0
    mask = (
        jnp.ones((b, n), bool)
        if valid is None
        else jnp.arange(n)[None] < jnp.asarray(valid)[:, None]
    )
    return PointCloud(positions=pts, mask=mask)


def _numpy_voxels(pts, cell):
    mn = pts.min(0) - 1e-6
    mx = pts.max(0) + 1e-6
    nc = ((mx - mn) / cell).astype(np.int32) + 1
    ci = np.clip(np.floor((pts - mn) / cell).astype(np.int64), 0, nc - 1)
    keys = (ci[:, 0] * nc[1] + ci[:, 1]) * nc[2] + ci[:, 2]
    return keys


def test_grid_subsample_matches_numpy_grouping():
    pc = _cloud(jax.random.PRNGKey(0), b=2, n=100, valid=[100, 73])
    cell = 0.35
    sub, smap = grid_subsample_cloud(pc, cell)
    for b in range(2):
        nv = int(np.asarray(pc.mask[b]).sum())
        pts = np.asarray(pc.positions[b])[:nv]
        keys = _numpy_voxels(pts, cell)
        uniq, inv = np.unique(keys, return_inverse=True)
        # cell count
        assert int(smap.n_cells[b]) == len(uniq)
        assert int(np.asarray(sub.mask[b]).sum()) == len(uniq)
        # point -> cell mapping identical (unique is sorted; so is ours)
        np.testing.assert_array_equal(np.asarray(smap.cell_id[b])[:nv], inv)
        # averaged positions
        expected = np.stack([pts[inv == c].mean(0) for c in range(len(uniq))])
        np.testing.assert_allclose(
            np.asarray(sub.positions[b])[: len(uniq)], expected, atol=1e-5
        )


def test_grid_subsample_feature_pooling_and_upsample():
    pc = _cloud(jax.random.PRNGKey(1), b=1, n=50)
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 50, 4))
    sub, smap = grid_subsample_cloud(pc, 0.5)
    pooled = smap.subsample(feats, "avg")
    up = smap.upsample(pooled)
    # Upsampled value at each point equals its cell's average.
    cid = np.asarray(smap.cell_id[0])
    np.testing.assert_allclose(np.asarray(up[0]), np.asarray(pooled[0])[cid], atol=1e-6)
    # max pooling
    pooled_max = smap.subsample(feats, "max")
    f = np.asarray(feats[0])
    for c in range(int(smap.n_cells[0])):
        np.testing.assert_allclose(
            np.asarray(pooled_max[0, c]), f[cid == c].max(0), atol=1e-6
        )


def test_grid_subsample_rnd_mode():
    pc = _cloud(jax.random.PRNGKey(3), b=1, n=60)
    smap = build_grid_subsample(pc, 0.4, rnd=True, rng=jax.random.PRNGKey(4))
    n_cells = int(smap.n_cells[0])
    chosen = np.asarray(smap.chosen_idx[0])[:n_cells]
    cid = np.asarray(smap.cell_id[0])
    # Each chosen point belongs to its cell.
    np.testing.assert_array_equal(cid[chosen], np.arange(n_cells))
    # subsample gathers the chosen points' values
    vals = smap.subsample(pc.positions)
    np.testing.assert_allclose(
        np.asarray(vals[0])[:n_cells], np.asarray(pc.positions[0])[chosen], atol=1e-6
    )


def test_grid_subsample_under_jit():
    pc = _cloud(jax.random.PRNGKey(5), b=2, n=80, valid=[80, 40])

    @jax.jit
    def f(pc):
        sub, smap = grid_subsample_cloud(pc, 0.3)
        return sub.positions, smap.n_cells

    pos, n = f(pc)
    assert pos.shape == (2, 80, 3)
    assert int(n[0]) > 0
