"""Local reference-frame sampling (PCA and random), pure JAX.

Re-implements the frame construction of reference
``pc/RotationFunctions.py:265-508`` and the frame-selection logic of
``pc/PointcloudRotEquiv.py:77-178`` for the padded ``[B, N, ...]`` layout.

Conventions (matching the reference exactly):
  * ``jnp.linalg.eigh`` returns eigenvalues ascending with eigenvectors as
    columns - the same convention as ``torch.linalg.eigh``.
  * If ``det(eigvec) < 0`` the *whole* matrix is negated (reference
    ``RotationFunctions.py:341-342``).
  * Free-axis PCA emits 4 frames: the eigenbasis with column sign sets
    ``(1,1,1), (1,-1,-1), (-1,1,-1), (-1,-1,1)`` (all det=+1 combinations,
    in ``itertools.product`` order - reference ``:344-356``).
  * Fixed-axis PCA (``fixed_axis`` in {1, 2}) zeroes that coordinate of the
    neighborhood, flips the eigen-order to descending, emits 2 frames with
    sign sets ``(1,1,1), (-1,-1,1)`` and permutes columns so the fixed axis
    ends up in the right slot (reference ``:357-406``).
  * A reference quirk preserved here: ``fixed_axis=0`` is *falsy* in the
    reference's truthiness check (``:323``) and therefore selects the free
    path; only 1 and 2 can actually be fixed.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .rotation import planar_rotations, random_rotations

__all__ = [
    "FREE_SIGN_SETS",
    "FIXED_SIGN_SETS",
    "pca_frames",
    "pca_frames_from_components",
    "global_pca_frames",
    "shuffle_and_select_frames",
    "random_frames",
    "is_fixed_axis",
]

# det=+1 column sign combinations, itertools.product((1,-1), repeat=3) order.
# Plain numpy on purpose: module-level jnp.array would dispatch a device op
# at import time, which must never happen (the default backend may be a
# remote/broken TPU — see VERDICT r2 #1; jnp auto-converts at trace time).
FREE_SIGN_SETS = np.array(
    [[1.0, 1.0, 1.0], [1.0, -1.0, -1.0], [-1.0, 1.0, -1.0], [-1.0, -1.0, 1.0]],
    dtype=np.float32,
)
FIXED_SIGN_SETS = np.array(
    [[1.0, 1.0, 1.0], [-1.0, -1.0, 1.0]], dtype=np.float32
)

_FIXED_AXIS_COLUMN_PERM = {1: (0, 2, 1), 2: (0, 1, 2)}
_SNAP_EPS = 1e-6


def is_fixed_axis(fixed_axis) -> bool:
    """Truthiness check used throughout the reference (``fixed_axis=0`` -> free)."""
    return bool(fixed_axis)


def _orient_positive(eigvec: jnp.ndarray) -> jnp.ndarray:
    """Negate whole matrices with negative determinant ``[..., 3, 3]``."""
    det = jnp.linalg.det(eigvec)
    return jnp.where(det[..., None, None] < 0, -eigvec, eigvec)


def eigh3x3(cov: jnp.ndarray):
    """Closed-form symmetric 3x3 eigendecomposition (batched, VPU-only).

    Returns ``(eigenvalues [..., 3] ascending, eigenvectors [..., 3, 3]
    as columns)`` — the ``jnp.linalg.eigh`` convention.  The general
    iterative eigh dominates hierarchy-build time on TPU (~0.7 s for the
    ~190k covariance matrices of a DFaust batch); the trigonometric
    closed form (Cardano eigenvalues + cross-product eigenvectors, cf.
    Eberly's robust 3x3 eigensolver) is elementwise VPU work.

    Not differentiable at degeneracies — frames are built under
    ``stop_gradient`` anyway (like the reference's ``torch.no_grad()``).
    """
    a = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))
    scale = jnp.maximum(jnp.max(jnp.abs(a), axis=(-2, -1), keepdims=True), 1e-30)
    b = a / scale

    q = jnp.trace(b, axis1=-2, axis2=-1)[..., None, None] / 3.0
    c = b - q * jnp.eye(3, dtype=b.dtype)
    p2 = jnp.sum(c * c, axis=(-2, -1), keepdims=True) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    safe_p = jnp.maximum(p, 1e-30)
    detc = jnp.linalg.det(c / safe_p)[..., None, None]
    r = jnp.clip(detc / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min
    lam = jnp.concatenate(
        [lam_min[..., 0], lam_mid[..., 0], lam_max[..., 0]], axis=-1
    )  # [..., 3] ascending

    def eigvec_for(lmbda):
        m = b - lmbda[..., None, None] * jnp.eye(3, dtype=b.dtype)
        r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
        n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
        n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
        v = jnp.where(n01 >= n02, c01, c02)
        nv = jnp.maximum(n01, n02)
        v = jnp.where(n12 > nv, c12, v)
        nv = jnp.maximum(nv, n12)
        # Degenerate: (b - lambda I) has rank <= 1 -> any vector in the
        # null plane works; fall back to a fixed axis made orthogonal
        # below.
        v = jnp.where(nv > 1e-24, v, jnp.array([1.0, 0.0, 0.0], b.dtype))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    v_min = eigvec_for(lam[..., 0])
    v_max = eigvec_for(lam[..., 2])
    # Orthonormal completion: guards repeated eigenvalues (v_min/v_max from
    # degenerate subspaces may not be orthogonal).
    v_mid = jnp.cross(v_max, v_min)
    n_mid = jnp.linalg.norm(v_mid, axis=-1, keepdims=True)
    # If v_min ~ v_max (fully degenerate), build an arbitrary orthobasis.
    alt = jnp.cross(v_max, jnp.array([0.0, 1.0, 0.0], b.dtype))
    alt = jnp.where(
        jnp.linalg.norm(alt, axis=-1, keepdims=True) > 1e-12,
        alt,
        jnp.cross(v_max, jnp.array([1.0, 0.0, 0.0], b.dtype)),
    )
    v_mid = jnp.where(n_mid > 1e-12, v_mid, alt)
    v_mid = v_mid / jnp.linalg.norm(v_mid, axis=-1, keepdims=True)
    v_min = jnp.cross(v_mid, v_max)
    v_min = v_min / jnp.linalg.norm(v_min, axis=-1, keepdims=True)

    eigvec = jnp.stack([v_min, v_mid, v_max], axis=-1)  # columns, ascending
    return lam * scale[..., 0], eigvec


def _eigh_frames(cov: jnp.ndarray) -> jnp.ndarray:
    """Batched symmetric 3x3 eigendecomposition -> eigenvector matrices.

    Eigenvalues ascending; eigenvectors are columns.
    """
    _, eigvec = eigh3x3(cov)
    return eigvec


def _expand_sign_sets(eigvec: jnp.ndarray, sign_sets: jnp.ndarray) -> jnp.ndarray:
    """``[..., 3, 3] x [S, 3] -> [..., S, 3, 3]`` column sign flips."""
    # sign_sets[s, j] multiplies column j (last axis indexes columns).
    return eigvec[..., None, :, :] * sign_sets[:, None, :]


def pca_frames(
    positions: jnp.ndarray,
    neigh_idx: jnp.ndarray,
    neigh_mask: jnp.ndarray,
    fixed_axis: Union[bool, int, None] = False,
) -> jnp.ndarray:
    """Per-point PCA reference frames from a padded kNN neighborhood.

    Args:
      positions: ``[..., N, 3]`` point coordinates.
      neigh_idx: ``[..., N, K]`` int indices into the N axis (in-bounds even
        when invalid).
      neigh_mask: ``[..., N, K]`` bool; invalid neighbors are replaced by the
        center point itself, reproducing the self-loop fill of reference
        ``RotationFunctions.py:314-317``.
      fixed_axis: False/None/0 -> free SO(3) frames (4 per point); 1 or 2 ->
        frames with that world axis fixed (2 per point).

    Returns:
      ``[..., N, S, 3, 3]`` frames, S = 4 (free) or 2 (fixed).
    """
    gathered = jnp.take_along_axis(
        positions[..., None, :], neigh_idx[..., None], axis=-3
    )  # [..., N, K, 3]
    center = positions[..., :, None, :]
    neigh_pts = jnp.where(neigh_mask[..., None], gathered, center)

    if is_fixed_axis(fixed_axis):
        axis = int(fixed_axis)
        if axis == 0:
            raise ValueError(
                "fixed_axis=0 is unreachable in the reference (falsy check); "
                "use False for free frames"
            )
        neigh_pts = neigh_pts.at[..., axis].set(0.0)

    centered = neigh_pts - jnp.mean(neigh_pts, axis=-2, keepdims=True)
    cov = jnp.einsum("...kd,...ke->...de", centered, centered)
    return _frames_from_cov(cov, fixed_axis)


def pca_frames_from_components(
    positions: jnp.ndarray,
    neigh_pos: jnp.ndarray,
    neigh_mask: jnp.ndarray,
    fixed_axis: Union[bool, int, None] = False,
) -> jnp.ndarray:
    """:func:`pca_frames` from pre-fetched neighbor coordinates.

    Same math and conventions as :func:`pca_frames`, but the neighbor
    positions arrive component-major (``Neighborhood.neigh_pos``,
    ``[..., 3, N, K]`` — the grid search carries them through its payload
    sorts), so no M*K-row position gather happens here; the covariance is
    assembled from per-component moments, never materialising a
    ``[..., K, 3]`` intermediate (TPU tiling pads a trailing 3 to 128
    lanes).  Reference semantics: ``RotationFunctions.py:307-406``
    including the self-loop fill for invalid neighbors (``:314-317``).

    Args:
      positions: ``[..., N, 3]`` query/center coordinates (the self-fill
        values).
      neigh_pos: ``[..., 3, N, K]`` neighbor coordinates, component-major.
      neigh_mask: ``[..., N, K]`` bool validity.
      fixed_axis: as in :func:`pca_frames`.
    """
    if is_fixed_axis(fixed_axis) and int(fixed_axis) == 0:
        raise ValueError(
            "fixed_axis=0 is unreachable in the reference (falsy check); "
            "use False for free frames"
        )
    comps = []
    for c in range(3):
        if is_fixed_axis(fixed_axis) and c == int(fixed_axis):
            comps.append(jnp.zeros_like(neigh_mask, positions.dtype))
            continue
        comps.append(
            jnp.where(
                neigh_mask,
                neigh_pos[..., c, :, :],
                positions[..., :, c : c + 1],
            )
        )
    centered = [p - jnp.mean(p, axis=-1, keepdims=True) for p in comps]
    entries = [
        [jnp.sum(centered[i] * centered[j], axis=-1) for j in range(3)]
        for i in range(3)
    ]
    cov = jnp.stack(
        [jnp.stack(row, axis=-1) for row in entries], axis=-2
    )  # [..., N, 3, 3]
    return _frames_from_cov(cov, fixed_axis)


def _frames_from_cov(
    cov: jnp.ndarray, fixed_axis: Union[bool, int, None]
) -> jnp.ndarray:
    """Shared eigendecomposition + sign-set tail of the PCA frame paths."""
    eigvec = _eigh_frames(cov)

    if is_fixed_axis(fixed_axis):
        axis = int(fixed_axis)
        eigvec = jnp.flip(eigvec, axis=-1)  # descending eigenvalue order
        eigvec = _orient_positive(eigvec)
        # The null-space eigenvector (last column after the flip) is +-the
        # fixed world axis; eigensolver sign conventions differ, but SO(2)
        # frames must PRESERVE the up-vector, so canonicalise it to +axis
        # (flipping one in-plane column too keeps det = +1).  The fixed
        # sign set below never touches the last column, so without this
        # the emitted frame set would depend on the solver.
        s = jnp.sign(eigvec[..., axis, 2])
        s = jnp.where(s == 0, 1.0, s)
        eigvec = eigvec * jnp.stack(
            [s, jnp.ones_like(s), s], axis=-1
        )[..., None, :]
        frames = _expand_sign_sets(eigvec, FIXED_SIGN_SETS)
        perm = _FIXED_AXIS_COLUMN_PERM[axis]
        frames = frames[..., :, perm]
        frames = jnp.where(jnp.abs(frames) < _SNAP_EPS, 0.0, frames)
        return frames

    eigvec = _orient_positive(eigvec)
    return _expand_sign_sets(eigvec, FREE_SIGN_SETS)


def global_pca_frames(positions: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """One set of 4 PCA frames per batch element from all valid points.

    Reference ``RotationFunctions.py:265-304`` (fixed-axis variant is
    unimplemented there too).

    Args:
      positions: ``[B, N, 3]``; mask: ``[B, N]``.
    Returns:
      ``[B, 4, 3, 3]``.
    """
    m = mask[..., None]
    count = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)[..., None]
    mean = jnp.sum(jnp.where(m, positions, 0.0), axis=-2, keepdims=True) / count
    centered = jnp.where(m, positions - mean, 0.0)
    cov = jnp.einsum("...kd,...ke->...de", centered, centered)
    eigvec = _orient_positive(_eigh_frames(cov))
    return _expand_sign_sets(eigvec, FREE_SIGN_SETS)


def shuffle_and_select_frames(
    key: jax.Array, frames: jnp.ndarray, n_frames: int
) -> jnp.ndarray:
    """Random per-point permutation of the S candidate frames; keep first n.

    Reference ``pc/PointcloudRotEquiv.py:146-168`` (``torch.multinomial``
    over uniform weights = uniform permutation).

    Args:
      frames: ``[..., S, 3, 3]``.
    Returns:
      ``[..., n_frames, 3, 3]``.
    """
    s = frames.shape[-3]
    scores = jax.random.uniform(key, frames.shape[:-2])  # [..., S]
    perm = jnp.argsort(scores, axis=-1)[..., :n_frames]
    return jnp.take_along_axis(frames, perm[..., None, None], axis=-3)


def random_frames(
    key: jax.Array,
    batch: int,
    n_points: int,
    n_frames: int,
    fixed_axis: Union[bool, int, None] = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Uniform-random frames ``[B, N, F, 3, 3]`` (non-PCA path).

    Reference ``RotationFunctions.py:428-508``: uniform SO(3) rotations, or
    planar rotations about ``fixed_axis`` (1 or 2; 0 falls through to the
    uniform path by the same truthiness quirk).
    """
    n = batch * n_points * n_frames
    if is_fixed_axis(fixed_axis):
        mats = planar_rotations(key, n, int(fixed_axis), dtype=dtype)
    else:
        mats = random_rotations(key, n, dtype=dtype)
    return mats.reshape(batch, n_points, n_frames, 3, 3)
