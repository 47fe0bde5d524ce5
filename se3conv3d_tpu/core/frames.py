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


# --- scalarized 3x3 eigenframe pipeline -------------------------------------
#
# TPU tiling pads a trailing dim of 3 to 128 lanes (and a trailing 3x3 to a
# full 8x128 tile), so any op that materialises a ``[..., N, 3]`` or
# ``[..., N, 3, 3]`` intermediate at hierarchy scale moves ~100x more HBM
# bytes than the math needs — the eigh/sign-set chain below used to cost
# ~330 ms of the 487 ms knn+PCA attach at 131k points on chip.  The whole
# pipeline therefore runs on per-component SCALAR arrays (batch shape
# ``[..., N]``, N on lanes): vectors are 3-tuples and matrices 3x3 nested
# tuples of scalars, and the padded ``[..., S, 3, 3]`` output is assembled
# exactly once at the end.  Same math and op order as the reference
# (``RotationFunctions.py:265-406``) and as the array forms above/below.


def _s_cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _s_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _s_where(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def _s_normalize(v):
    return tuple(x / jnp.sqrt(_s_dot(v, v)) for x in v)


def _s_det_sym(xx, xy, xz, yy, yz, zz):
    """Determinant of a symmetric 3x3 from its 6 scalar entries."""
    return (
        xx * (yy * zz - yz * yz)
        - xy * (xy * zz - yz * xz)
        + xz * (xy * yz - yy * xz)
    )


def _eigh3x3_scalars(sxx, sxy, sxz, syy, syz, szz):
    """Closed-form symmetric eigh on 6 scalar entry arrays.

    Returns ``((lam_min, lam_mid, lam_max), V)`` with ``V[i][j]`` the i-th
    component of the j-th eigenvector (columns, eigenvalues ascending) —
    the same Cardano + cross-product construction as :func:`eigh3x3`.
    """
    scale = jnp.abs(sxx)
    for e in (sxy, sxz, syy, syz, szz):
        scale = jnp.maximum(scale, jnp.abs(e))
    scale = jnp.maximum(scale, 1e-30)
    bxx, bxy, bxz = sxx / scale, sxy / scale, sxz / scale
    byy, byz, bzz = syy / scale, syz / scale, szz / scale

    q = (bxx + byy + bzz) / 3.0
    cxx, cyy, czz = bxx - q, byy - q, bzz - q
    p2 = (
        cxx * cxx + cyy * cyy + czz * czz
        + 2.0 * (bxy * bxy + bxz * bxz + byz * byz)
    ) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    safe_p = jnp.maximum(p, 1e-30)
    detc = _s_det_sym(
        cxx / safe_p, bxy / safe_p, bxz / safe_p,
        cyy / safe_p, byz / safe_p, czz / safe_p,
    )
    r = jnp.clip(detc / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min

    one = jnp.ones_like(bxx)
    zero = jnp.zeros_like(bxx)

    def eigvec_for(lmbda):
        r0 = (bxx - lmbda, bxy, bxz)
        r1 = (bxy, byy - lmbda, byz)
        r2 = (bxz, byz, bzz - lmbda)
        c01, c02, c12 = _s_cross(r0, r1), _s_cross(r0, r2), _s_cross(r1, r2)
        n01, n02, n12 = _s_dot(c01, c01), _s_dot(c02, c02), _s_dot(c12, c12)
        v = _s_where(n01 >= n02, c01, c02)
        nv = jnp.maximum(n01, n02)
        v = _s_where(n12 > nv, c12, v)
        nv = jnp.maximum(nv, n12)
        # Degenerate: rank <= 1 -> any null-plane vector works; fixed axis,
        # made orthogonal by the completion below.
        v = _s_where(nv > 1e-24, v, (one, zero, zero))
        return _s_normalize(v)

    v_min = eigvec_for(lam_min)
    v_max = eigvec_for(lam_max)
    # Orthonormal completion (guards repeated eigenvalues).
    v_mid = _s_cross(v_max, v_min)
    n_mid = jnp.sqrt(_s_dot(v_mid, v_mid))
    # cross(v_max, e_y) resp. cross(v_max, e_x), written out.
    alt = (-v_max[2], zero, v_max[0])
    alt = _s_where(
        jnp.sqrt(_s_dot(alt, alt)) > 1e-12,
        alt,
        (zero, v_max[2], -v_max[1]),
    )
    v_mid = _s_where(n_mid > 1e-12, v_mid, alt)
    v_mid = _s_normalize(v_mid)
    v_min = _s_normalize(_s_cross(v_mid, v_max))

    lam = (lam_min * scale, lam_mid * scale, lam_max * scale)
    cols = (v_min, v_mid, v_max)
    v = tuple(tuple(cols[j][i] for j in range(3)) for i in range(3))
    return lam, v


def _frames_from_cov_scalars(
    sxx, sxy, sxz, syy, syz, szz, fixed_axis, select_idx=None
):
    """Scalarized eigh + sign-set tail: 6 cov entries -> ``[..., S, 3, 3]``.

    All selection/sign logic runs on ``[...]``-shaped scalars; one
    ``jnp.stack`` assembles the padded output.  ``select_idx`` ``[..., F]``
    (optional) fuses the per-point frame selection of
    :func:`shuffle_and_select_frames` into the assembly.
    """
    _, v = _eigh3x3_scalars(sxx, sxy, sxz, syy, syz, szz)

    def orient_positive(m):
        # Negate the whole matrix when det < 0 (reference
        # ``RotationFunctions.py:341-342``) — after any column reorder,
        # since reversing 3 columns negates the determinant.
        det = (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )
        neg = det < 0
        return tuple(
            tuple(jnp.where(neg, -m[i][j], m[i][j]) for j in range(3))
            for i in range(3)
        )

    if is_fixed_axis(fixed_axis):
        axis = int(fixed_axis)
        # Descending eigenvalue order = reversed columns (flip first, THEN
        # orient: the reversal itself negates the determinant).
        vd = tuple(tuple(v[i][2 - j] for j in range(3)) for i in range(3))
        vd = orient_positive(vd)
        # The null-space eigenvector (last column after the flip) is +-the
        # fixed world axis; eigensolver sign conventions differ, but SO(2)
        # frames must PRESERVE the up-vector, so canonicalise it to +axis
        # (flipping one in-plane column too keeps det = +1).  The fixed
        # sign set never touches the last column, so without this the
        # emitted frame set would depend on the solver.
        s = jnp.sign(vd[axis][2])
        s = jnp.where(s == 0, 1.0, s)
        vd = tuple(
            (vd[i][0] * s, vd[i][1], vd[i][2] * s) for i in range(3)
        )
        perm = _FIXED_AXIS_COLUMN_PERM[axis]
        frames = []
        for ss in FIXED_SIGN_SETS:
            f = tuple(
                tuple(vd[i][perm[j]] * float(ss[perm[j]]) for j in range(3))
                for i in range(3)
            )
            frames.append(f)
        snap = lambda x: jnp.where(jnp.abs(x) < _SNAP_EPS, 0.0, x)
        frames = [
            tuple(tuple(snap(e) for e in row) for row in f) for f in frames
        ]
    else:
        v = orient_positive(v)
        frames = [
            tuple(
                tuple(v[i][j] * float(ss[j]) for j in range(3))
                for i in range(3)
            )
            for ss in FREE_SIGN_SETS
        ]

    if select_idx is not None:
        # Fused shuffle_and_select: pick n_frames of the S candidates per
        # point BEFORE assembly, so the padded [..., S, 3, 3] tensor (and
        # the row gather over it) never materialises.  ``select_idx``
        # [..., F] holds candidate indices; selection is a scalar
        # where-chain per component.
        picked = []
        for f in range(select_idx.shape[-1]):
            sel = select_idx[..., f]
            comp = [[frames[0][i][j] for j in range(3)] for i in range(3)]
            for s in range(1, len(frames)):
                hit = sel == s
                for i in range(3):
                    for j in range(3):
                        comp[i][j] = jnp.where(
                            hit, frames[s][i][j], comp[i][j]
                        )
            picked.append(comp)
        frames = picked

    return jnp.stack(
        [
            jnp.stack(
                [jnp.stack(row, axis=-1) for row in f], axis=-2
            )
            for f in frames
        ],
        axis=-3,
    )  # [..., S, 3, 3] (or [..., F, 3, 3] under select_idx)


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
    lam, v = _eigh3x3_scalars(
        a[..., 0, 0], a[..., 0, 1], a[..., 0, 2],
        a[..., 1, 1], a[..., 1, 2], a[..., 2, 2],
    )
    eigvec = jnp.stack(
        [jnp.stack(row, axis=-1) for row in v], axis=-2
    )  # columns, ascending
    return jnp.stack(lam, axis=-1), eigvec


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
    select_idx: Optional[jnp.ndarray] = None,
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
    )  # [..., N, K, 3] — one fat-row gather (pad-to-128 makes 3-col rows
    # cost the same as wider ones); everything downstream runs
    # component-major so the padded [..., K, 3] layout is read exactly once.
    neigh_pos = jnp.moveaxis(gathered, -1, -3)  # [..., 3, N, K]
    return pca_frames_from_components(
        positions, neigh_pos, neigh_mask, fixed_axis=fixed_axis,
        select_idx=select_idx,
    )


def pca_frames_from_components(
    positions: jnp.ndarray,
    neigh_pos: jnp.ndarray,
    neigh_mask: jnp.ndarray,
    fixed_axis: Union[bool, int, None] = False,
    select_idx: Optional[jnp.ndarray] = None,
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
    x, y, z = centered
    return _frames_from_cov_scalars(
        jnp.sum(x * x, axis=-1),
        jnp.sum(x * y, axis=-1),
        jnp.sum(x * z, axis=-1),
        jnp.sum(y * y, axis=-1),
        jnp.sum(y * z, axis=-1),
        jnp.sum(z * z, axis=-1),
        fixed_axis,
        select_idx=select_idx,
    )


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
    if n_frames > frames.shape[-3]:
        raise ValueError(
            f"n_frames={n_frames} exceeds the {frames.shape[-3]} candidate "
            "frames (4 free / 2 fixed-axis PCA candidates)"
        )
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
