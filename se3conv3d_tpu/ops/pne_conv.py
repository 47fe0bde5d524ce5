"""Point-neighborhood-embedding convolution ops (XLA compute path).

This module fuses what the reference splits across four pieces:

  * ``LinearPNE`` / ``KPPNE`` edge embeddings
    (reference ``custom_ops/PNE.py:3-163``),
  * the local-frame / relative-rotation geometry tensors of
    ``PNEConvLayerRotEquiv.get_rot_tenors``
    (reference ``layers/PNEConvLayerRotEquiv.py:62-128``),
  * the CUDA ``feat_basis_proj`` segment outer-product accumulation
    (reference ``custom_ops/feature_aggregation/feat_basis_proj.cu:24-185``),
  * and the final ``einsum('nik,iko->no')`` weight contraction
    (reference ``layers/PNEConvLayer.py:222``).

into single jitted einsum pipelines over padded fixed-degree neighbor
tables.  All contractions are shaped so XLA lowers them onto the MXU
(batched matmuls over the K / K*F edge axis); gradients flow through the
learned parameters only - geometry is wrapped in ``stop_gradient``, which
reproduces the reference's design where neither neighbor search, PNE point
inputs nor frames receive gradients (``custom_ops/PNE.py:57-61``,
``PNEConvLayerRotEquiv.py:67``).

Shape glossary: B batch, M query points, N source points, K neighbors,
G out-frames, F in-frames, Cb num_basis, Ci/Co channels.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.neighborhoods import Neighborhood
from ..core.pointcloud import PointCloud
from ..core.rotation import matrix_to_quaternion, matrix_to_rotation_6d

__all__ = [
    "pne_activation",
    "linear_pne",
    "kp_pne",
    "basis_conv",
    "equiv_geometry",
    "equiv_geometry_parts",
    "equiv_basis_conv",
]


def pne_activation(name: str) -> Optional[Callable]:
    """Activation by pne_type suffix (reference ``PNEConvLayer.py:91-100``)."""
    table = {
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "sin": jnp.sin,
        "softmax": lambda x: jax.nn.softmax(x, axis=-1),
        "linear": None,
    }
    for suffix, fn in table.items():
        if name.endswith(suffix):
            return fn
    raise ValueError(f"unknown pne type {name!r}")


def _gather_neighbors(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather ``[B, N, ...]`` values at ``[B, M, K]`` indices -> ``[B, M, K, ...]``."""
    return jax.vmap(lambda v, i: v[i])(values, idx)


def relative_offsets(
    pc_in: PointCloud, pc_out: PointCloud, neigh: Neighborhood, norm_dist: jnp.ndarray
) -> jnp.ndarray:
    """Normalised edge offsets ``(src - center) * norm_dist`` -> ``[B, M, K, 3]``.

    Reference ``custom_ops/PNE.py:38`` / ``PNEConvLayerRotEquiv.py:68-69``.
    """
    src = _gather_neighbors(pc_in.positions, neigh.idx)
    rel = (src - pc_out.positions[:, :, None, :]) * norm_dist
    return jax.lax.stop_gradient(rel)


def linear_pne(
    rel: jnp.ndarray,
    proj_axes: jnp.ndarray,
    proj_biases: jnp.ndarray,
    act: Optional[Callable],
) -> jnp.ndarray:
    """MLP point-neighborhood embedding ``[..., D] -> [..., Cb]``.

    Reference ``custom_ops/PNE.py:38-40`` + activation.
    """
    out = rel @ proj_axes + proj_biases
    return out if act is None else act(out)


def kp_pne(
    rel: jnp.ndarray,
    kernel_pts: jnp.ndarray,
    sigma: float,
    corr: str,
    proj_axes: jnp.ndarray,
    proj_biases: jnp.ndarray,
) -> jnp.ndarray:
    """Kernel-point embedding (reference ``custom_ops/PNE.py:108-127``).

    Args:
      rel: ``[..., 3]`` normalised offsets.
      kernel_pts: ``[P, 3]`` icosphere kernel points.
      corr: 'gauss' | 'linear' | 'box'.
    Returns:
      ``[..., Cb]``.
    """
    d = jnp.sqrt(jnp.sum((rel[..., None, :] - kernel_pts) ** 2, axis=-1)) / sigma
    if corr == "gauss":
        w = jnp.exp(-(d**2) / 2.0)
    elif corr == "linear":
        w = jnp.clip(1.0 - d, min=0.0)
    elif corr == "box":
        w = jax.nn.one_hot(jnp.argmin(d, axis=-1), kernel_pts.shape[0], dtype=rel.dtype)
    else:
        raise ValueError(f"unknown correlation {corr!r}")
    return w @ proj_axes + proj_biases


def basis_conv(
    pne: jnp.ndarray,
    features: jnp.ndarray,
    neigh: Neighborhood,
    conv_weights: jnp.ndarray,
    norm_num_neighs: jnp.ndarray,
    compute_dtype=None,
) -> jnp.ndarray:
    """Standard (non-equivariant) basis-projection convolution.

    ``out[b,m,o] = norm * sum_{k,c,cb} pne[b,m,k,cb] feat[b,nbr,c] W[c,cb,o]``

    The two einsums are the padded-layout equivalents of CUDA
    ``feat_basis_proj`` + ``einsum('nik,iko->no')``
    (reference ``feat_basis_proj.cu:24-185``, ``PNEConvLayer.py:218-229``).

    Args:
      pne: ``[B, M, K, Cb]`` edge embeddings (invalid edges must already be
        masked to zero).
      features: ``[B, N, Ci]``.
      conv_weights: ``[Ci, Cb, Co]``.
    Returns:
      ``[B, M, Co]``.
    """
    out_dtype = features.dtype
    if compute_dtype is not None:
        # bf16 multiplies on the MXU with f32 accumulation — the TPU-native
        # mixed-precision path (results cast back to the input dtype).
        # Cast BEFORE the gather: the neighbor gather is the bandwidth hog
        # and bf16 halves its bytes.
        features = features.astype(compute_dtype)
        pne = pne.astype(compute_dtype)
        conv_weights = conv_weights.astype(compute_dtype)
    gathered = _gather_neighbors(features, neigh.idx)  # [B, M, K, Ci]
    basis = jnp.einsum(
        "bmkc,bmkq->bmcq", gathered, pne, preferred_element_type=jnp.float32
    )  # segment outer product
    if compute_dtype is not None:
        basis = basis.astype(compute_dtype)
    out = jnp.einsum(
        "bmcq,cqo->bmo", basis, conv_weights, preferred_element_type=jnp.float32
    )
    return out.astype(out_dtype) * norm_num_neighs


def equiv_geometry_parts(
    pc_in: PointCloud,
    pc_out: PointCloud,
    neigh: Neighborhood,
    rel_rot_type: str = "6D",
):
    """Per-edge rot-equivariant geometry, unscaled.

    Returns ``(rel_local [B, M, K, G, 3], rot_feat [B, M, K, G, F, R])``:
      * the edge offset expressed in each receiver frame g (WITHOUT the
        per-layer ``norm_neigh_dist`` scale — a scalar that commutes with
        the frame rotation, applied by the consuming layer),
      * the relative rotation ``g^T f`` in the chosen representation.

    Computed once per neighborhood and shared by all conv layers on it —
    the role of the reference's rot-tensor cache
    (``PNEConvLayerRotEquiv.get_rot_tenors``, ``:62-128``).  Wrapped in
    ``stop_gradient`` like the reference's ``torch.no_grad()`` build.
    """
    src = _gather_neighbors(pc_in.positions, neigh.idx)
    rel = src - pc_out.positions[:, :, None, :]  # [B,M,K,3]
    frames_out = pc_out.frames  # [B, M, G, 3, 3]
    frames_in = _gather_neighbors(pc_in.frames, neigh.idx)  # [B, M, K, F, 3, 3]

    # Offset in each receiver frame: v @ R_g  -> [B, M, K, G, 3]
    rel_local = jnp.einsum("bmkd,bmgde->bmkge", rel, frames_out)
    # Relative rotations R_g^T R_f -> [B, M, K, G, F, 3, 3]
    rel_rot = jnp.einsum("bmgdp,bmkfdq->bmkgfpq", frames_out, frames_in)

    if rel_rot_type == "6D":
        rot_feat = matrix_to_rotation_6d(rel_rot)
    elif rel_rot_type == "quaternion":
        rot_feat = matrix_to_quaternion(rel_rot)
    elif rel_rot_type == "matrix":
        rot_feat = rel_rot.reshape(rel_rot.shape[:-2] + (9,))
    else:
        raise ValueError(f"unknown rel_rot_type {rel_rot_type!r}")
    return (
        jax.lax.stop_gradient(rel_local),
        jax.lax.stop_gradient(rot_feat),
    )


def equiv_geometry(
    pc_in: PointCloud,
    pc_out: PointCloud,
    neigh: Neighborhood,
    norm_dist: jnp.ndarray,
    rel_rot_type: str = "6D",
) -> jnp.ndarray:
    """Geometry input of the rot-equivariant PNE: ``[B, M, K, G, F, 3+R]``.

    ``equiv_geometry_parts`` scaled by ``norm_dist`` and broadcast over the
    in-frame axis (reference ``PNEConvLayerRotEquiv.py:76-84``).  Uses the
    neighborhood's cached parts when present.
    """
    expected_r = {"6D": 6, "quaternion": 4, "matrix": 9}[rel_rot_type]
    if neigh.equiv_rel is not None and neigh.equiv_rot.shape[-1] == expected_r:
        rel_local, rot_feat = neigh.equiv_rel, neigh.equiv_rot
    else:
        rel_local, rot_feat = equiv_geometry_parts(
            pc_in, pc_out, neigh, rel_rot_type
        )
    f = rot_feat.shape[4]
    rel_scaled = rel_local * norm_dist
    rel_scaled = jnp.broadcast_to(
        rel_scaled[:, :, :, :, None, :], rel_scaled.shape[:4] + (f, 3)
    )
    return jnp.concatenate([rel_scaled, rot_feat], axis=-1)


def equiv_basis_conv(
    pne: jnp.ndarray,
    features: jnp.ndarray,
    neigh: Neighborhood,
    conv_weights: jnp.ndarray,
    norm_num_neighs: jnp.ndarray,
    compute_dtype=None,
) -> jnp.ndarray:
    """Rot-equivariant basis-projection convolution.

    ``out[b,m,g,o] = norm/F * sum_{k,f,c,cb} pne[b,m,k,g,f,cb]
                                  feat[b,nbr(m,k),f,c] W[c,cb,o]``

    Equivalent to the reference's frame-expanded edge list + CUDA
    ``feat_basis_proj`` + einsum + ``/F_in`` + ``*norm``
    (``PNEConvLayerRotEquiv.py:92-216``) - here the (K, F) product is a
    single MXU contraction axis instead of an index-expanded CSR list.

    Args:
      pne: ``[B, M, K, G, F, Cb]`` (invalid edges masked to zero).
      features: ``[B, N, F, Ci]``.
      conv_weights: ``[Ci, Cb, Co]``.
    Returns:
      ``[B, M, G, Co]``.
    """
    f_in = features.shape[2]
    out_dtype = features.dtype
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
        pne = pne.astype(compute_dtype)
        conv_weights = conv_weights.astype(compute_dtype)
    gathered = _gather_neighbors(features, neigh.idx)  # [B, M, K, F, Ci]
    basis = jnp.einsum(
        "bmkfc,bmkgfq->bmgcq", gathered, pne, preferred_element_type=jnp.float32
    )
    if compute_dtype is not None:
        basis = basis.astype(compute_dtype)
    out = jnp.einsum(
        "bmgcq,cqo->bmgo", basis, conv_weights, preferred_element_type=jnp.float32
    )
    return out.astype(out_dtype) * (norm_num_neighs / f_in)
