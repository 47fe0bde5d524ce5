"""Rotation / reference-frame math (pure JAX).

Semantics follow reference ``pc/RotationFunctions.py`` (which itself follows
pytorch3d conventions): quaternions are ``(w, x, y, z)`` with real part
first; rotation matrices act on *column* vectors by left multiplication; a
frame matrix stores the frame's basis vectors as columns.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "random_quaternions",
    "random_rotations",
    "matrix_to_rotation_6d",
    "relative_rotations",
    "to_local_direction",
    "to_local_points",
    "planar_rotations",
]


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternions ``[..., 4]`` (w first) -> rotation matrices ``[..., 3, 3]``.

    Same formula as reference ``pc/RotationFunctions.py:53-82``.
    """
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices ``[..., 3, 3]`` -> quaternions ``[..., 4]`` (w first).

    Best-conditioned-candidate construction as in reference
    ``pc/RotationFunctions.py:114-173``.
    """
    batch = m.shape[:-2]
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(
        m.reshape(batch + (9,)), -1, 0
    )
    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(
        quat_candidates, best[..., None, None], axis=-2
    ).squeeze(-2)


def random_quaternions(key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """``n`` random unit quaternions with non-negative real part.

    Matches the distribution of reference ``pc/RotationFunctions.py:176-197``
    (gaussian 4-vector normalised, sign-flipped to w >= 0).
    """
    o = jax.random.normal(key, (n, 4), dtype=dtype)
    s = jnp.sqrt(jnp.sum(o * o, axis=1, keepdims=True))
    o = o / jnp.where(o[:, :1] < 0, -s, s)
    return o


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """``n`` uniformly distributed rotation matrices ``[n, 3, 3]``."""
    return quaternion_to_matrix(random_quaternions(key, n, dtype))


def matrix_to_rotation_6d(m: jnp.ndarray) -> jnp.ndarray:
    """First two *rows* of the matrix flattened -> ``[..., 6]``.

    Zhou et al. 6D representation, as in reference
    ``pc/RotationFunctions.py:236-252``.
    """
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def relative_rotations(frames_a: jnp.ndarray, frames_b: jnp.ndarray) -> jnp.ndarray:
    """All pairwise relative rotations ``A_g^T B_f``.

    Args:
      frames_a: ``[..., G, 3, 3]`` receiver frames.
      frames_b: ``[..., F, 3, 3]`` sender frames.
    Returns:
      ``[..., G, F, 3, 3]``; flattening (G, F) row-major reproduces the
      ``(k times)`` / ``(times k)`` pairing of reference
      ``pc/RotationFunctions.py:549-600`` (index ``l = g * F + f``).
    """
    return jnp.einsum("...gij,...fik->...gfjk", frames_a, frames_b)


def to_local_direction(vectors: jnp.ndarray, frames: jnp.ndarray) -> jnp.ndarray:
    """Express world-space direction row-vectors in local frames.

    Args:
      vectors: ``[..., 3]``.
      frames: ``[..., F, 3, 3]``.
    Returns:
      ``[..., F, 3]`` = ``v @ R`` per frame (equals ``R^T v`` as a column
      vector).  Reference ``pc/RotationFunctions.py:637-665``.
    """
    return jnp.einsum("...d,...fdk->...fk", vectors, frames)


def to_local_points(points: jnp.ndarray, origins: jnp.ndarray, frames: jnp.ndarray) -> jnp.ndarray:
    """Express world-space points in local frames anchored at ``origins``.

    Reference ``pc/RotationFunctions.py:605-634``.
    """
    return to_local_direction(points - origins, frames)


def planar_rotations(key: jax.Array, n: int, axis: int, dtype=jnp.float32) -> jnp.ndarray:
    """``n`` random rotations about a fixed coordinate axis ``[n, 3, 3]``.

    Counter-clockwise for column-vector pre-multiplication; layout matches
    reference ``pc/RotationFunctions.py:453-506``.
    """
    ang = jax.random.uniform(key, (n,), dtype=dtype) * (2.0 * jnp.pi)
    c, s = jnp.cos(ang), jnp.sin(ang)
    z = jnp.zeros_like(ang)
    o = jnp.ones_like(ang)
    if axis == 0:
        rows = (o, z, z, z, c, -s, z, s, c)
    elif axis == 1:
        rows = (c, z, s, z, o, z, -s, z, c)
    elif axis == 2:
        rows = (c, -s, z, s, c, z, z, z, o)
    else:
        raise ValueError(f"axis must be 0, 1 or 2, got {axis}")
    return jnp.stack(rows, axis=-1).reshape(n, 3, 3)
