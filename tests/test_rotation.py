"""Rotation math vs. independent oracles (torch CPU / numpy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3conv3d_tpu.core import rotation as R


def test_quaternion_matrix_roundtrip():
    key = jax.random.PRNGKey(0)
    q = R.random_quaternions(key, 64)
    m = R.quaternion_to_matrix(q)
    # Orthonormal, det +1.
    eye = jnp.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(m), np.ones(64), atol=1e-5)
    q2 = R.matrix_to_quaternion(m)
    # Quaternion double cover: compare up to sign.
    flip = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, q2 * flip, atol=1e-5)


def test_quaternion_to_matrix_against_scipy_convention():
    # Independent formula check: w-first quaternion (0.5,0.5,0.5,0.5) is the
    # cyclic permutation x->y->z->x.
    q = jnp.array([[0.5, 0.5, 0.5, 0.5]])
    m = R.quaternion_to_matrix(q)[0]
    expected = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_rotation_6d_is_first_two_rows():
    key = jax.random.PRNGKey(1)
    m = R.random_rotations(key, 8)
    six = R.matrix_to_rotation_6d(m)
    np.testing.assert_allclose(six, np.asarray(m)[:, :2, :].reshape(8, 6))


def test_relative_rotations_pairing_order():
    fa = R.random_rotations(jax.random.PRNGKey(3), 2).reshape(1, 2, 3, 3)
    fb = R.random_rotations(jax.random.PRNGKey(4), 3).reshape(1, 3, 3, 3)
    rel = R.relative_rotations(fa, fb)  # [1, 2, 3, 3, 3]
    assert rel.shape == (1, 2, 3, 3, 3)
    for g in range(2):
        for f in range(3):
            expected = np.asarray(fa)[0, g].T @ np.asarray(fb)[0, f]
            np.testing.assert_allclose(rel[0, g, f], expected, atol=1e-5)


def test_to_local_direction_matches_matrix_transpose():
    key = jax.random.PRNGKey(5)
    frames = R.random_rotations(key, 4).reshape(2, 2, 3, 3)
    v = jax.random.normal(jax.random.PRNGKey(6), (2, 3))
    local = R.to_local_direction(v, frames)
    for n in range(2):
        for f in range(2):
            expected = np.asarray(frames)[n, f].T @ np.asarray(v)[n]
            np.testing.assert_allclose(local[n, f], expected, atol=1e-5)


def test_planar_rotations_fix_axis():
    for axis in range(3):
        m = R.planar_rotations(jax.random.PRNGKey(axis), 16, axis)
        e = np.zeros(3)
        e[axis] = 1.0
        np.testing.assert_allclose(np.asarray(m) @ e, np.broadcast_to(e, (16, 3)), atol=1e-6)
        np.testing.assert_allclose(jnp.linalg.det(m), np.ones(16), atol=1e-5)


def test_random_rotations_uniformity_moments():
    # E[R] = 0 and E[R_ij^2] = 1/3 for Haar-uniform rotations.
    m = R.random_rotations(jax.random.PRNGKey(7), 4096)
    np.testing.assert_allclose(jnp.mean(m, axis=0), np.zeros((3, 3)), atol=0.05)
    np.testing.assert_allclose(jnp.mean(m**2, axis=0), np.full((3, 3), 1 / 3), atol=0.05)
