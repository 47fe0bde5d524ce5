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
