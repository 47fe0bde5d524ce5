"""Parity of the gather-free PCA frame path.

``attach_frames`` now asks the kNN search to carry neighbor coordinates
through its payload sorts (``want_positions``) and builds frames via
``pca_frames_from_components`` — sparing an M*K-row position gather per
level (row gathers are latency-bound per row on TPU).  Pin:

  * ``Neighborhood.neigh_pos`` matches ``positions[idx]`` wherever the
    mask is set, on BOTH the brute-force and the grid search paths
    (including rows routed through the compacted coarse backfill);
  * ``pca_frames_from_components`` == ``pca_frames`` (the gather oracle)
    for free and fixed-axis frames, with masked/padded rows.
"""
import jax
import jax.numpy as jnp
import numpy as np

from se3conv3d_tpu.core.frames import pca_frames, pca_frames_from_components
from se3conv3d_tpu.core.neighborhoods import knn_neighborhood
from se3conv3d_tpu.core.pointcloud import PointCloud

K = 16


def _check_positions(pc, neigh):
    pos = np.asarray(pc.positions)
    idx = np.asarray(neigh.idx)
    mask = np.asarray(neigh.mask)
    got = np.asarray(neigh.neigh_pos)  # [B, 3, M, K]
    for b in range(pos.shape[0]):
        want = pos[b][idx[b]]  # [M, K, 3]
        for c in range(3):
            np.testing.assert_allclose(
                got[b, c][mask[b]], want[..., c][mask[b]], rtol=0, atol=0
            )


def _check_frames(pc, neigh, fixed_axis, atol=5e-4):
    oracle = pca_frames(
        pc.positions, neigh.idx, neigh.mask, fixed_axis=fixed_axis
    )
    comp = pca_frames_from_components(
        pc.positions, neigh.neigh_pos, neigh.mask, fixed_axis=fixed_axis
    )
    # Same covariance up to summation order; eigenvectors of generic
    # (well-separated) spectra match to fp tolerance.  Near-degenerate
    # in-plane spectra (regular surface grids) amplify the summation-
    # order difference — callers pass a looser atol for such scenes.
    np.testing.assert_allclose(
        np.asarray(comp), np.asarray(oracle), atol=atol
    )


def _cloud(rng, b, n, n_valid):
    pts = rng.standard_normal((b, n, 3)).astype(np.float32) * 0.7
    pts[..., 2] *= 0.2  # anisotropic: keeps PCA spectra well-separated
    mask = np.zeros((b, n), bool)
    for i in range(b):
        mask[i, : n_valid[i]] = True
    return PointCloud(positions=jnp.asarray(pts), mask=jnp.asarray(mask))


def test_brute_path_positions_and_frames():
    rng = np.random.default_rng(0)
    pc = _cloud(rng, 2, 256, [256, 200])
    neigh = knn_neighborhood(pc, pc, K, want_positions=True)
    assert neigh.neigh_pos.shape == (2, 3, 256, K)
    _check_positions(pc, neigh)
    _check_frames(pc, neigh, fixed_axis=False)
    _check_frames(pc, neigh, fixed_axis=2)


def test_grid_path_positions_and_frames():
    # Above GRID_AUTO_THRESHOLD: surface-sampled scene (fine pass mostly
    # exact) plus a sparse scatter that routes rows through the coarse
    # backfill — positions must survive the union sorts and the
    # compacted-buffer round trip.
    rng = np.random.default_rng(1)
    s = 0.05
    grid = np.stack(
        np.meshgrid(np.arange(180), np.arange(180), indexing="ij"), -1
    ).reshape(-1, 2)
    surf = np.concatenate(
        [grid * s, np.zeros((grid.shape[0], 1))], axis=1
    ) + rng.standard_normal((grid.shape[0], 3)) * 0.01
    sparse = rng.uniform(0, 9.0, (1500, 3)) * [1.0, 1.0, 0.3]
    scene = np.concatenate([surf, sparse]).astype(np.float32)
    n = scene.shape[0]
    assert n > 32768
    pc = PointCloud(
        positions=jnp.asarray(scene)[None], mask=jnp.ones((1, n), bool)
    )
    neigh = knn_neighborhood(
        pc, pc, K, grid_cell_size=s, want_positions=True
    )
    _check_positions(pc, neigh)
    _check_frames(pc, neigh, fixed_axis=2, atol=1e-2)


def test_knn_without_positions_unchanged():
    rng = np.random.default_rng(2)
    pc = _cloud(rng, 1, 128, [128])
    plain = knn_neighborhood(pc, pc, K)
    withpos = knn_neighborhood(pc, pc, K, want_positions=True)
    assert plain.neigh_pos is None
    np.testing.assert_array_equal(np.asarray(plain.idx), np.asarray(withpos.idx))
    np.testing.assert_array_equal(np.asarray(plain.mask), np.asarray(withpos.mask))
