"""Dataset loaders against synthetic on-disk fixtures (ScanNet npz format,
ModelNet40 txt format), including augmentation plumbing and valid-id
tracking through crops."""
import os

import numpy as np
import pytest

from se3conv3d_tpu.data import (
    MaxPointsBatchSampler,
    ModelNet40Dataset,
    ScanNetDataset,
    pad_collate,
)


@pytest.fixture()
def scannet_root(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "scannet"
    (root / "train").mkdir(parents=True)
    (root / "segments").mkdir()
    names = ["scene0000_00", "scene0001_00"]
    with open(root / "scannet_train.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    with open(root / "color_stats.txt", "w") as f:
        f.write("0.5,0.5,0.5\n0.25,0.25,0.25\n")
    with open(root / "label_20_stats.txt", "w") as f:
        f.write("\n".join(["0.05"] * 21) + "\n")
    for i, name in enumerate(names):
        n = 500 + 100 * i
        np.savez(
            root / "train" / f"{name}.npz",
            points=rng.uniform(0, 4, (n, 3)).astype(np.float32),
            normals=rng.standard_normal((n, 3)).astype(np.float32),
            colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
            labels_20=rng.integers(0, 21, n).astype(np.int32),
            obj_instance=np.zeros(n, np.int32),
        )
        np.savez(
            root / "segments" / f"{name}_seg.npz",
            segments=rng.integers(0, 40, n).astype(np.int64),
        )
    return str(root)


def test_scannet_dataset_loads_and_normalizes(scannet_root):
    ds = ScanNetDataset(scannet_root, split="train", load_segments=True)
    assert len(ds) == 2
    assert ds.get_num_pts(0) == 500 and ds.get_num_pts(1) == 600
    s = ds[0]
    assert s["positions"].shape == (500, 3)
    assert s["features"].shape == (500, 6)  # normals ++ normalized rgb
    assert s["labels"].shape == (500,)
    assert s["segments"].shape == (500,)
    np.testing.assert_array_equal(s["valid_ids"], np.arange(500))
    # Colors normalized by the stats file: mean 0.5, std 0.25.
    raw = np.load(os.path.join(scannet_root, "train", "scene0000_00.npz"))
    np.testing.assert_allclose(
        s["features"][:, 3:], (raw["colors"] - 0.5) / 0.25, atol=1e-5
    )


def test_scannet_crop_tracks_valid_ids(scannet_root):
    augs = [
        {"name": "CropPtsAug", "p_prob": 1.0, "p_max_pts": 200,
         "p_apply_extra_tensors": [True, True, True, True]},
    ]
    ds = ScanNetDataset(
        scannet_root, split="train", load_segments=True, augmentations=augs,
    )
    s = ds[0]
    assert s["positions"].shape[0] == 200
    assert s["valid_ids"].shape == (200,)
    # Cropped features/labels stay aligned with surviving original points.
    raw = np.load(os.path.join(scannet_root, "train", "scene0000_00.npz"))
    np.testing.assert_allclose(
        s["positions"], raw["points"][s["valid_ids"]], atol=1e-6
    )
    np.testing.assert_array_equal(s["labels"], raw["labels_20"][s["valid_ids"]])


def test_scannet_coords_as_feats(scannet_root):
    ds = ScanNetDataset(
        scannet_root, split="train", pt_coords_as_feats=True,
        scale_pt_feats=0.2,
    )
    s = ds[0]
    assert s["features"].shape == (500, 9)
    np.testing.assert_allclose(s["features"][:, 6:], s["positions"] * 0.2, atol=1e-6)


def test_scannet_sampler_and_collate(scannet_root):
    ds = ScanNetDataset(scannet_root, split="train")
    sampler = MaxPointsBatchSampler(
        num_batches=3, max_points_per_batch=1200, dataset=ds,
    )
    for scene_ids in sampler:
        samples = [ds[i] for i in scene_ids]
        keep = ("positions", "features", "labels")
        batch = pad_collate(
            [{k: s[k] for k in keep} for s in samples], bucket=256
        )
        assert batch["positions"].shape[0] == len(scene_ids)
        assert batch["mask"].sum() == sum(s["positions"].shape[0] for s in samples)


@pytest.fixture()
def mn40_root(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "mn40"
    root.mkdir()
    classes = ["airplane", "night_stand"]
    with open(root / "modelnet40_shape_names.txt", "w") as f:
        f.write("\n".join(classes) + "\n")
    names = ["airplane_0001", "night_stand_0001"]
    with open(root / "modelnet40_train.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    for name in names:
        cls = "_".join(name.split("_")[:-1])
        (root / cls).mkdir(exist_ok=True)
        data = rng.standard_normal((64, 6)).astype(np.float32)
        np.savetxt(root / cls / f"{name}.txt", data, delimiter=",")
    return str(root)


def test_modelnet40_dataset_txt_and_h5_cache(mn40_root):
    ds = ModelNet40Dataset(mn40_root, num_pts=32, split="train")
    assert len(ds) == 2
    s0 = ds[0]
    assert s0["positions"].shape == (32, 3)
    # default: constant-ones features — the reference task behavior
    # (train_rot.py:117-120, train_standard.py:134); normals in the
    # feature channel break SO(3) eval invariance
    assert s0["features"].shape == (32, 1)
    np.testing.assert_allclose(s0["features"], 1.0)
    assert int(s0["label"]) == 0
    assert int(ds[1]["label"]) == 1  # multi-token class name parses
    # h5 cache was written; a second instance loads from it.
    assert os.path.exists(os.path.join(mn40_root, "tmp_train_32.h5"))
    ds2 = ModelNet40Dataset(mn40_root, num_pts=32, split="train")
    np.testing.assert_allclose(ds2.pts, ds.pts)
    # loader-level payload (reference ModelNet40.py:80-201) still exposed
    ds3 = ModelNet40Dataset(
        mn40_root, num_pts=32, split="train", use_ones_features=False
    )
    assert ds3[0]["features"].shape == (32, 6)  # normals ++ coords
