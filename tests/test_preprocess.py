"""DFaust preprocessing: surface sampling, label merge, file round-trip."""
import numpy as np

from se3conv3d_tpu.preprocess import (
    merge_joint_labels,
    sample_labelled_cloud,
    sample_surface_even,
    save_model_files,
)


def _unit_cube_mesh():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float
    )
    f = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
         [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
         [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]]
    )
    return v, f


def test_sample_surface_even_on_mesh():
    v, f = _unit_cube_mesh()
    rng = np.random.default_rng(0)
    face_idx, r = sample_surface_even(v, f, 500, rng)
    assert face_idx.shape == (500,) and r.shape == (500, 2)
    sqr = np.sqrt(r[:, 0:1])
    pts = (
        (1 - sqr) * v[f[face_idx, 0]]
        + sqr * (1 - r[:, 1:]) * v[f[face_idx, 1]]
        + sqr * r[:, 1:] * v[f[face_idx, 2]]
    )
    # All samples lie on the cube surface.
    on_face = np.any(np.isclose(pts, 0.0, atol=1e-9) | np.isclose(pts, 1.0, atol=1e-9), 1)
    assert on_face.all()
    # Reasonably even: every face of the cube receives samples.
    assert len(np.unique(face_idx // 2)) == 6


def test_merge_joint_labels():
    w = np.eye(24)
    merged = merge_joint_labels(w)
    expected = np.arange(24)
    expected[22], expected[23], expected[10], expected[11] = 20, 21, 7, 8
    np.testing.assert_array_equal(merged, expected)
    # 20 distinct classes remain, none of 10/11/22/23.
    assert set(merged) & {10, 11, 22, 23} == set()
    assert len(set(merged)) == 20


def test_sample_labelled_cloud_and_loader_roundtrip(tmp_path):
    v, f = _unit_cube_mesh()
    # Fake lbs: weight by height -> labels partition along z.
    lbs = np.zeros((8, 24))
    for i, vert in enumerate(v):
        lbs[i, 0 if vert[2] < 0.5 else 5] = 1.0
    pts, labels = sample_labelled_cloud(v, f, lbs, count=300, rng=np.random.default_rng(1))
    assert pts.shape == (300, 3) and labels.shape == (300,)
    assert set(np.unique(labels)) <= {0, 5}
    # Bottom points labelled 0, top labelled 5 (away from the seam).
    assert (labels[pts[:, 2] < 0.3] == 0).all()
    assert (labels[pts[:, 2] > 0.7] == 5).all()

    save_model_files(str(tmp_path), 0, pts, labels)
    from se3conv3d_tpu.data import DFaustDataset

    (tmp_path / "train").mkdir()
    save_model_files(str(tmp_path / "train"), 0, pts, labels)
    ds = DFaustDataset(str(tmp_path), num_pts=300, split="train")
    sample = ds[0]
    assert sample["positions"].shape == (300, 3)
    # Loader remap: labels > 9 shift by -2 (5 stays 5).
    assert set(np.unique(sample["labels"])) <= {0, 5}


# --- AMASS archive readers (reference preprocessing_dataset.py:11-106) ------


def _fake_sequence(rng, t, fname):
    return {
        "fname": fname,
        "markers": rng.standard_normal((t, 67, 3)).astype(np.float32),
        "poses": rng.standard_normal((t, 156)).astype(np.float32),
        "trans": rng.standard_normal((t, 3)).astype(np.float32),
        "betas": rng.standard_normal(16).astype(np.float32),
    }


def test_load_amass_train_joblib_archive(tmp_path):
    import joblib

    from se3conv3d_tpu.preprocess import iter_pose_params, load_amass_train

    rng = np.random.default_rng(0)
    seqs = [_fake_sequence(rng, 3, "a"), _fake_sequence(rng, 2, "b")]
    joblib.dump(seqs, tmp_path / "DFaust_67_train.pth.tar")

    frames = load_amass_train(str(tmp_path))
    assert len(frames) == 5  # sequences concatenate along frames
    assert frames.poses.shape == (5, 156)
    # betas repeat per frame within a sequence
    np.testing.assert_array_equal(frames.betas[0], frames.betas[2])
    # one fname entry per FRAME (owning sequence repeated)
    assert frames.fnames == ["a", "a", "a", "b", "b"]

    params = list(iter_pose_params(frames))
    assert len(params) == 5
    p = params[0]
    np.testing.assert_array_equal(p["global_orient"], frames.poses[0][:3])
    # 63 body-pose dims + 6 zero hand dims (reference SMPLX_layer padding)
    assert p["body_pose"].shape == (69,)
    assert (p["body_pose"][-6:] == 0).all()
    assert p["betas"].shape == (10,)


def _write_webdataset_tar(path, samples):
    """webdataset layout: one ``<key>.input.pth`` torch payload per sample."""
    import io
    import tarfile

    import torch

    with tarfile.open(path, "w") as tf:
        for key, payload in samples:
            buf = io.BytesIO()
            torch.save(payload, buf)
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"{key}.input.pth")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def test_load_amass_test_webdataset_tars(tmp_path):
    import torch

    from se3conv3d_tpu.preprocess import load_amass_test

    rng = np.random.default_rng(1)
    d = tmp_path / "MPI_Limits"
    d.mkdir()
    mk = lambda f: {  # noqa: E731
        "fname": f,
        "markers": torch.from_numpy(rng.standard_normal((67, 3)).astype(np.float32)),
        "poses": torch.from_numpy(rng.standard_normal(156).astype(np.float32)),
        "trans": torch.from_numpy(rng.standard_normal(3).astype(np.float32)),
        "betas": torch.from_numpy(rng.standard_normal(16).astype(np.float32)),
    }
    # name order: tar files iterate sorted by stem
    _write_webdataset_tar(d / "b.tar", [("s2", mk("f2")), ("s3", mk("f3"))])
    _write_webdataset_tar(d / "a.tar", [("s1", mk("f1"))])

    frames = load_amass_test(str(tmp_path))
    assert len(frames) == 3
    assert frames.fnames == ["f1", "f2", "f3"]
    assert frames.poses.shape == (3, 156)
    assert frames.trans.shape == (3, 3)


def test_regenerate_dfaust_roundtrip(tmp_path):
    """End-to-end: AMASS-shaped archive -> model_{i}_pc/labels.pt pairs the
    DFaustDataset loader consumes (injected poser, no SMPL files)."""
    import joblib
    import torch

    from se3conv3d_tpu.preprocess import load_amass_train, regenerate_dfaust

    rng = np.random.default_rng(2)
    joblib.dump([_fake_sequence(rng, 2, "seq")], tmp_path / "DFaust_67_train.pth.tar")
    frames = load_amass_train(str(tmp_path))

    v, f = _unit_cube_mesh()
    lbs = np.zeros((len(v), 24))
    lbs[np.arange(len(v)), np.arange(len(v)) % 24] = 1.0

    def pose_fn(params):
        # a fake SMPL: translate the cube by the pose's global orient
        return v + params["global_orient"][None, :], f, lbs

    out = tmp_path / "train"
    n = regenerate_dfaust(frames, str(out), pose_fn=pose_fn, num_points=200)
    assert n == 2
    for i in range(2):
        pts = torch.load(out / f"model_{i}_pc.pt")
        labels = torch.load(out / f"model_{i}_labels.pt")
        assert pts.shape == (200, 3) and labels.shape == (200,)
    # consumable by the production loader
    from se3conv3d_tpu.data import DFaustDataset

    ds = DFaustDataset(str(tmp_path), augmentations=[], num_pts=128, split="train")
    sample = ds[0]
    assert sample["positions"].shape == (128, 3)
