"""Augmentation pipeline + collation/sampler tests (host-side numpy)."""
import numpy as np
import pytest

from se3conv3d_tpu.data import (
    AugPipeline,
    CenterAug,
    CropBoxAug,
    CropPtsAug,
    DropAug,
    ElasticDistortionAug,
    LinearAug,
    MirrorAug,
    MaxPointsBatchSampler,
    NoiseAug,
    RotationAug,
    RotationAug3D,
    STDDevNormAug,
    TranslationAug,
    mix3d_merge,
    pad_collate,
)


def _pts(n=100, seed=0):
    return np.random.default_rng(seed).standard_normal((n, 3)).astype(np.float32)


def test_center_aug_subtracts_mean_on_enabled_axes():
    pts = _pts() + 5.0
    aug = CenterAug(p_axes=[True, True, False])
    out, (c,), _ = aug(np.random.default_rng(0), pts, [])
    np.testing.assert_allclose(out[:, :2].mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out[:, 2], pts[:, 2])


def test_rotation_aug_preserves_distances_and_rotates_extras():
    pts = _pts()
    normals = _pts(seed=1)
    aug = RotationAug(p_axis=2, p_apply_extra_tensors=[True])
    out, (axis, ang), extras = aug(np.random.default_rng(2), pts, [normals])
    d0 = np.linalg.norm(pts[1:] - pts[:-1], axis=1)
    d1 = np.linalg.norm(out[1:] - out[:-1], axis=1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5)
    np.testing.assert_allclose(out[:, 2], pts[:, 2], atol=1e-6)  # axis-2 fixed
    # normals rotated by the same matrix: dot products preserved
    np.testing.assert_allclose(
        (pts * normals).sum(1), (out * extras[0]).sum(1), rtol=1e-4, atol=1e-5
    )


def test_rotation3d_uniform_is_orthogonal():
    aug = RotationAug3D()
    out, (r,), _ = aug(np.random.default_rng(3), _pts(), [])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) > 0.99


def test_mirror_aug_flips_signs():
    pts = _pts()
    aug = MirrorAug(p_mirror_prob=0.0, p_axes=[True, True, True])  # always flips
    out, (vec,), _ = aug(np.random.default_rng(4), pts, [])
    np.testing.assert_allclose(out, pts * vec)
    assert (vec == -1).all()


def test_noise_aug_clips():
    aug = NoiseAug(p_stddev=1.0, p_clip=0.01)
    out, (noise,), _ = aug(np.random.default_rng(5), _pts(), [])
    assert np.abs(noise).max() <= 0.01 + 1e-7


def test_linear_aug_epoch_schedule():
    aug = LinearAug(p_a_values=[[2.0], [3.0]], p_b_values=[[0.5], [0.0]])
    pts = _pts()
    out, _, _ = aug(np.random.default_rng(6), pts, [])
    np.testing.assert_allclose(out, pts * 2.0 + 0.5, rtol=1e-6)
    aug.increase_epoch_counter()
    out2, _, _ = aug(np.random.default_rng(6), pts, [])
    np.testing.assert_allclose(out2, pts * 3.0, rtol=1e-6)


def test_translation_aug_bounded_by_aabb():
    pts = _pts()
    aug = TranslationAug(p_max_aabb_ratio=1.0)
    out, (disp,), _ = aug(np.random.default_rng(7), pts, [])
    half = (pts.max(0) - pts.min(0)) / 2.0
    assert (np.abs(disp) <= half + 1e-6).all()
    np.testing.assert_allclose(out, pts + disp)


def test_stddev_norm_aug():
    pts = _pts() * 7.3
    aug = STDDevNormAug(p_new_std=1.0)
    out, _, _ = aug(np.random.default_rng(8), pts, [])
    np.testing.assert_allclose(out.std(0, ddof=1).max(), 1.0, rtol=1e-5)


def test_drop_aug_remove_and_zero_modes():
    pts = _pts(1000)
    labels = np.arange(1000)
    rm = DropAug(p_drop_prob=0.3, p_keep_zeros=False, p_apply_extra_tensors=[True])
    out, (keep,), extras = rm(np.random.default_rng(9), pts, [labels])
    assert out.shape[0] == keep.sum() and extras[0].shape[0] == keep.sum()
    zero = DropAug(p_drop_prob=0.3, p_keep_zeros=True)
    out2, (keep2,), _ = zero(np.random.default_rng(10), pts, [])
    assert out2.shape == pts.shape
    np.testing.assert_allclose(out2[~keep2], 1.0)  # reference fills with 1


def test_crop_pts_keeps_nearest_ball():
    pts = _pts(500)
    aug = CropPtsAug(p_max_pts=100, p_apply_extra_tensors=[True])
    ids = np.arange(500)
    out, (keep,), extras = aug(np.random.default_rng(11), pts, [ids])
    assert out.shape[0] == 100 and extras[0].shape[0] == 100
    # Kept set = 100 nearest to some center: max kept distance <= min dropped.
    kept, dropped = pts[keep], pts[~keep]
    ok = False
    for c in kept:  # the seed point is one of the kept points
        dk = ((kept - c) ** 2).sum(1).max()
        dd = ((dropped - c) ** 2).sum(1).min()
        if dk <= dd + 1e-6:
            ok = True
            break
    assert ok


def test_crop_box_nonempty():
    pts = _pts(300)
    aug = CropBoxAug(p_min_crop_size=0.5, p_max_crop_size=1.0)
    out, (keep, origin, size), _ = aug(np.random.default_rng(12), pts, [])
    assert out.shape[0] >= 1
    assert np.all(out >= origin - 1e-6) and np.all(out <= origin + size + 1e-6)


def test_elastic_distortion_moves_points_boundedly():
    pts = _pts(200) * 2.0
    aug = ElasticDistortionAug(p_granularity=[0.5], p_magnitude=[0.1])
    out, _, _ = aug(np.random.default_rng(13), pts, [])
    assert out.shape == pts.shape
    disp = np.abs(out - pts)
    assert disp.max() > 0.0 and disp.max() < 1.0


def test_pipeline_probability_and_order():
    cfg = [
        {"name": "CenterAug", "p_apply_extra_tensors": [False]},
        {"name": "NoiseAug", "p_prob": 0.0, "p_stddev": 100.0},
    ]
    pipe = AugPipeline(cfg)
    pts = _pts() + 3.0
    out, params, _ = pipe.augment(np.random.default_rng(14), pts, [np.zeros((100, 3))])
    names = [n for n, _ in params]
    assert names == ["CenterAug"]  # NoiseAug prob 0 never fires
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)


def test_pad_collate_buckets_and_masks():
    samples = [
        {"positions": _pts(100), "features": np.ones((100, 4), np.float32),
         "labels": np.ones(100, np.int32), "label": np.int32(3)},
        {"positions": _pts(37), "features": np.ones((37, 4), np.float32),
         "labels": np.ones(37, np.int32), "label": np.int32(5)},
    ]
    batch = pad_collate(samples, bucket=64)
    assert batch["positions"].shape == (2, 128, 3)
    assert batch["mask"].sum(1).tolist() == [100, 37]
    assert batch["features"].shape == (2, 128, 4)
    assert batch["label"].tolist() == [3, 5]
    assert (batch["labels"][1, 37:] == 0).all()


def test_mix3d_merge():
    a = {"positions": _pts(10), "labels": np.zeros(10, np.int32), "mix3d": True,
         "scene_id": np.int32(0)}
    b = {"positions": _pts(20), "labels": np.ones(20, np.int32), "mix3d": False,
         "scene_id": np.int32(1)}
    c = {"positions": _pts(5), "labels": np.ones(5, np.int32), "mix3d": False,
         "scene_id": np.int32(2)}
    merged = mix3d_merge([a, b, c])
    assert len(merged) == 2
    assert merged[0]["positions"].shape[0] == 30
    assert merged[1]["positions"].shape[0] == 5


def test_mix3d_merge_respects_capacity():
    """Two budget-packed scenes whose merge would exceed the padded
    per-element capacity must stay two elements (the reference is ragged
    and never faces this; pad_collate would crash on the oversize merge)."""
    a = {"positions": _pts(10), "labels": np.zeros(10, np.int32), "mix3d": True,
         "scene_id": np.int32(0)}
    b = {"positions": _pts(20), "labels": np.ones(20, np.int32), "mix3d": False,
         "scene_id": np.int32(1)}
    merged = mix3d_merge([a, b], capacity=25)
    assert len(merged) == 2  # 10 + 20 > 25: merge skipped
    assert all("mix3d" not in s for s in merged)
    merged = mix3d_merge([a, b], capacity=30)
    assert len(merged) == 1  # exactly fits


class _FakeDS:
    def __init__(self, sizes):
        self.sizes = sizes

    def __len__(self):
        return len(self.sizes)

    def get_num_pts(self, i):
        return self.sizes[i]


def test_max_points_sampler_respects_budget():
    ds = _FakeDS([120_000, 80_000, 50_000, 200_000, 30_000, 90_000])
    sampler = MaxPointsBatchSampler(
        num_batches=10, max_points_per_batch=250_000, dataset=ds,
        max_scene_pts=120_000,
    )
    batches = list(iter(sampler))
    assert len(batches) == 10
    capped = [min(s, 120_000) for s in ds.sizes]
    for b in batches:
        assert len(b) >= 1
        assert sum(capped[i] for i in b) <= 250_000 + 120_000  # greedy bound


def test_always_applied_augs_swallow_p_prob():
    """Reference aug configs may carry p_prob for the always-applied augs
    (their constructors swallow it via **kwargs); ported configs must not
    crash here (CenterAug.py:24, STDDevNormAug.py force prob 1.0)."""
    from se3conv3d_tpu.data.augment import CenterAug, STDDevNormAug

    aug = CenterAug(p_prob=0.5, p_axes=[True, True, True])
    assert aug.prob_ == 1.0
    aug = STDDevNormAug(p_prob=0.5)
    assert aug.prob_ == 1.0


def test_dropaug_keep_zeros_preserves_1d_extras():
    """keep_zeros fills dropped rows with 1 in every extra; a 1-D extra
    (labels/segments) must keep its shape instead of broadcasting to
    [N, N]."""
    from se3conv3d_tpu.data.augment import DropAug

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    labels = np.arange(50, dtype=np.int64)
    aug = DropAug(p_drop_prob=0.5, p_keep_zeros=True,
                  p_apply_extra_tensors=[True])
    out, (keep,), (lab,) = aug(rng, pts, [labels])
    assert out.shape == (50, 3) and lab.shape == (50,)
    np.testing.assert_array_equal(lab[keep], labels[keep])
    assert (lab[~keep] == 1).all()
    assert (out[~keep] == 1.0).all()
