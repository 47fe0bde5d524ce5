"""PCA frame construction: spec oracle (torch/numpy) + equivariance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3conv3d_tpu.core import frames as F
from se3conv3d_tpu.core import neighborhoods as NB
from se3conv3d_tpu.core import rotation as R
from se3conv3d_tpu.core.pointcloud import PointCloud


def _numpy_pca_frames_free(points, neigh_idx, neigh_mask):
    """Independent numpy oracle implementing the reference recipe
    (RotationFunctions.py:307-356): self-loop fill, cov, eigh ascending,
    det fix on whole matrix, 4 det=+1 column sign sets."""
    n, k = neigh_idx.shape
    out = np.zeros((n, 4, 3, 3))
    signs = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], dtype=float)
    for i in range(n):
        nbr = np.where(neigh_mask[i, :, None], points[neigh_idx[i]], points[i])
        c = nbr - nbr.mean(0, keepdims=True)
        cov = c.T @ c
        w, v = np.linalg.eigh(cov)
        if np.linalg.det(v) < 0:
            v = -v
        for s in range(4):
            out[i, s] = v * signs[s][None, :]
    return out


def _make_cloud(key, n=64):
    pts = jax.random.normal(key, (1, n, 3))
    pts = pts * jnp.array([2.0, 1.0, 0.5])  # anisotropic so PCA is well-defined
    return PointCloud(positions=pts, mask=jnp.ones((1, n), bool))


def test_pca_frames_match_numpy_oracle():
    pc = _make_cloud(jax.random.PRNGKey(0))
    nb = NB.knn_neighborhood(pc, pc, k=8)
    fr = F.pca_frames(pc.positions, nb.idx, nb.mask)
    oracle = _numpy_pca_frames_free(
        np.asarray(pc.positions[0]), np.asarray(nb.idx[0]), np.asarray(nb.mask[0])
    )
    got = np.asarray(fr[0])
    # eigh eigenvector signs can differ framework-to-framework only via the
    # det fix; both impls produce identical matrices because both use
    # ascending-eigenvalue eigh with columns-as-eigenvectors + det fix.
    # Allow column-sign ambiguity only through set matching of the 4 frames.
    for i in range(got.shape[0]):
        for s in range(4):
            diffs = np.abs(got[i, s][None] - oracle[i]).max(axis=(1, 2))
            assert diffs.min() < 2e-2, (i, s, diffs)


def test_pca_frames_orthonormal_det_one():
    pc = _make_cloud(jax.random.PRNGKey(1), n=128)
    nb = NB.knn_neighborhood(pc, pc, k=16)
    fr = F.pca_frames(pc.positions, nb.idx, nb.mask)
    m = np.asarray(fr).reshape(-1, 3, 3)
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", m, m), np.broadcast_to(np.eye(3), m.shape), atol=1e-4
    )
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)


def _eigengaps(points, idx, mask):
    """Per-point minimum eigenvalue gap of the neighborhood covariance."""
    gaps = []
    for i in range(idx.shape[0]):
        nbr = np.where(mask[i, :, None], points[idx[i]], points[i])
        c = nbr - nbr.mean(0, keepdims=True)
        w = np.linalg.eigvalsh(c.T @ c)
        gaps.append(min(np.diff(w)) / max(abs(w[-1]), 1e-12))
    return np.asarray(gaps)


def test_pca_frames_equivariance():
    """R-rotating the cloud maps the 4-frame set to R @ frames (as a set).

    Uses identical neighbor indices for both clouds so the test isolates the
    frame-construction math (kNN ties under f32 rotation would otherwise
    change neighborhoods); skips eigen-degenerate points where eigh's
    eigenvector choice is unstable in f32.
    """
    pc = _make_cloud(jax.random.PRNGKey(2), n=96)
    rot = np.asarray(R.random_rotations(jax.random.PRNGKey(3), 1))[0]
    pc_rot = PointCloud(
        positions=jnp.einsum("bnd,ed->bne", pc.positions, jnp.asarray(rot)),
        mask=pc.mask,
    )
    nb = NB.knn_neighborhood(pc, pc, k=12)
    fr = np.asarray(F.pca_frames(pc.positions, nb.idx, nb.mask)[0])
    fr_rot = np.asarray(F.pca_frames(pc_rot.positions, nb.idx, nb.mask)[0])
    expected = np.einsum("ed,nsdc->nsec", rot, fr)
    gaps = _eigengaps(np.asarray(pc.positions[0]), np.asarray(nb.idx[0]), np.asarray(nb.mask[0]))
    checked = 0
    # Set-match the 4 frames per point (eigh sign/order may permute the set).
    for i in range(fr.shape[0]):
        if gaps[i] < 0.05:
            continue
        checked += 1
        for s in range(4):
            diffs = np.abs(expected[i, s][None] - fr_rot[i]).max(axis=(1, 2))
            assert diffs.min() < 5e-2, (i, s, diffs.min())
    assert checked > fr.shape[0] // 2


def test_fixed_axis_frames_keep_axis():
    """fixed_axis=2 frames have +-e_z as the third column (axis preserved)."""
    pc = _make_cloud(jax.random.PRNGKey(4), n=64)
    nb = NB.knn_neighborhood(pc, pc, k=8)
    fr = np.asarray(F.pca_frames(pc.positions, nb.idx, nb.mask, fixed_axis=2)[0])
    assert fr.shape[1] == 2
    third_col = fr[:, :, :, 2]
    np.testing.assert_allclose(np.abs(third_col[..., 2]), 1.0, atol=1e-4)
    np.testing.assert_allclose(third_col[..., :2], 0.0, atol=1e-4)
    m = fr.reshape(-1, 3, 3)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)


def test_fixed_axis_frames_so2_equivariance():
    """Rotation about z maps fixed-axis-2 frames to rotated frames (set)."""
    pc = _make_cloud(jax.random.PRNGKey(5), n=64)
    rot = np.asarray(R.planar_rotations(jax.random.PRNGKey(6), 1, axis=2))[0]
    pc_rot = PointCloud(
        positions=jnp.einsum("bnd,ed->bne", pc.positions, jnp.asarray(rot)),
        mask=pc.mask,
    )
    nb = NB.knn_neighborhood(pc, pc, k=8)
    fr = np.asarray(F.pca_frames(pc.positions, nb.idx, nb.mask, fixed_axis=2)[0])
    fr_rot = np.asarray(
        F.pca_frames(pc_rot.positions, nb.idx, nb.mask, fixed_axis=2)[0]
    )
    expected = np.einsum("ed,nsdc->nsec", rot, fr)
    checked = 0
    for i in range(fr.shape[0]):
        diffs0 = np.abs(expected[i, 0][None] - fr_rot[i]).max(axis=(1, 2))
        if diffs0.min() > 0.5:
            continue  # planar eigen-degenerate point; unstable in f32
        checked += 1
        for s in range(2):
            diffs = np.abs(expected[i, s][None] - fr_rot[i]).max(axis=(1, 2))
            assert diffs.min() < 2e-2
    assert checked > fr.shape[0] // 2


def test_shuffle_and_select_frames():
    frames = jnp.arange(2 * 5 * 4 * 9, dtype=jnp.float32).reshape(2, 5, 4, 3, 3)
    out = F.shuffle_and_select_frames(jax.random.PRNGKey(0), frames, 2)
    assert out.shape == (2, 5, 2, 3, 3)
    # Every selected frame is one of the candidates of the same point.
    fnp, onp = np.asarray(frames), np.asarray(out)
    for b in range(2):
        for i in range(5):
            for j in range(2):
                diffs = np.abs(fnp[b, i] - onp[b, i, j][None]).max(axis=(1, 2))
                assert diffs.min() == 0.0
    # Distinct frames selected (permutation without replacement).
    assert not np.allclose(onp[:, :, 0], onp[:, :, 1])


def test_global_pca_frames_shape_and_validity():
    pc = _make_cloud(jax.random.PRNGKey(7), n=64)
    fr = F.global_pca_frames(pc.positions, pc.mask)
    assert fr.shape == (1, 4, 3, 3)
    m = np.asarray(fr).reshape(-1, 3, 3)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)


def test_eigh3x3_matches_lapack():
    """Closed-form 3x3 eigensolver vs jnp.linalg.eigh: eigenvalues match;
    eigenvectors match up to sign (and up to subspace rotation when
    degenerate); output is orthonormal."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from se3conv3d_tpu.core.frames import eigh3x3

    rng = np.random.default_rng(0)
    mats = []
    # random SPD
    a = rng.standard_normal((64, 3, 3))
    mats.append(a @ a.transpose(0, 2, 1))
    # rank-2 (coplanar neighborhoods, the fixed-axis path)
    b = rng.standard_normal((16, 3, 2))
    mats.append(b @ b.transpose(0, 2, 1))
    # rank-1 (collinear)
    c = rng.standard_normal((8, 3, 1))
    mats.append(c @ c.transpose(0, 2, 1))
    # isotropic + zero
    mats.append(np.stack([np.eye(3) * 2.5, np.zeros((3, 3))]))
    cov = np.concatenate(mats).astype(np.float64)

    lam, vec = eigh3x3(jnp.asarray(cov))
    lam, vec = np.asarray(lam), np.asarray(vec)
    lam_ref, vec_ref = np.linalg.eigh(cov)

    # f32 tolerances (the test suite runs with x64 disabled); errors are
    # relative to the matrix scale.
    scale = np.maximum(np.abs(cov).max(axis=(1, 2)), 1e-9)
    np.testing.assert_allclose(lam / scale[:, None], lam_ref / scale[:, None], atol=5e-4)
    # Orthonormal columns.
    ident = np.einsum("nij,nik->njk", vec, vec)
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), ident.shape), atol=1e-6)
    # A v = lambda v for every column (covers degenerate subspaces too).
    av = np.einsum("nij,njk->nik", cov, vec)
    lv = lam[:, None, :] * vec
    np.testing.assert_allclose(
        av / scale[:, None, None], lv / scale[:, None, None], atol=5e-4
    )


def test_eigh3x3_f32_accuracy_on_covariances():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from se3conv3d_tpu.core.frames import eigh3x3

    rng = np.random.default_rng(1)
    pts = rng.standard_normal((128, 16, 3)).astype(np.float32) * 0.2
    centered = pts - pts.mean(1, keepdims=True)
    cov = np.einsum("nkd,nke->nde", centered, centered)
    lam, vec = eigh3x3(jnp.asarray(cov))
    av = np.einsum("nij,njk->nik", cov, np.asarray(vec))
    lv = np.asarray(lam)[:, None, :] * np.asarray(vec)
    scale = np.abs(cov).max(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(av / scale, lv / scale, atol=2e-5)
