"""Native host-prep library (C++/ctypes) vs. numpy semantics."""
import numpy as np
import pytest

from se3conv3d_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_voxel_keys_match_numpy(lib):
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    cell = 0.3
    keys = native.voxel_keys(pts, cell)
    mn = pts.min(0) - 1e-6
    mx = pts.max(0) + 1e-6
    nc = ((mx - mn) / cell).astype(np.int64) + 1
    ci = np.clip(np.floor((pts - mn) / cell).astype(np.int64), 0, nc - 1)
    expected = (ci[:, 0] * nc[1] + ci[:, 1]) * nc[2] + ci[:, 2]
    np.testing.assert_array_equal(keys, expected)


def test_crop_nearest_is_a_ball(lib):
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((800, 3)).astype(np.float32)
    keep = native.crop_nearest(pts, 200, seed=7)
    assert keep.sum() == 200
    kept, dropped = pts[keep], pts[~keep]
    ok = False
    for c in kept:
        if ((kept - c) ** 2).sum(1).max() <= ((dropped - c) ** 2).sum(1).min() + 1e-5:
            ok = True
            break
    assert ok


def test_elastic_distortion_bounded_and_smooth(lib):
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 2, (2000, 3)).astype(np.float32)
    out = native.elastic_distortion(pts, [0.5], [0.1], seed=3)
    assert out.shape == pts.shape
    disp = out - pts.astype(np.float64)
    assert 0.0 < np.abs(disp).max() < 1.0
    # Smooth: nearby points move together (displacement field is blurred
    # noise on a 0.5-granularity grid).
    d = np.linalg.norm(pts[:, None, :3][:50] - pts[None, :50, :3], axis=-1)
    close = (d < 0.05) & (d > 0)
    if close.any():
        i, j = np.nonzero(close)
        rel = np.linalg.norm(disp[:50][i] - disp[:50][j], axis=-1)
        assert rel.max() < 0.25 * np.abs(disp).max() + 1e-3


def test_aug_pipeline_uses_native_path(lib):
    from se3conv3d_tpu.data import ElasticDistortionAug

    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 2, (1000, 3)).astype(np.float32)
    aug = ElasticDistortionAug(p_granularity=[0.5], p_magnitude=[0.1])
    out, _, _ = aug(rng, pts, [])
    assert out.shape == pts.shape
    assert np.abs(out - pts).max() > 0.0
