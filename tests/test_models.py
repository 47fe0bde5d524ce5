"""Model zoo: forward shapes, calibration, and end-to-end SE(3) equivariance.

The equivariance test is the property the whole framework exists to deliver
(SURVEY §4): with the *same* hierarchy geometry expressed in a globally
rotated world (positions and frames rotated, voxelization kept), frame-pooled
logits must be bitwise-close, because every conv only consumes offsets in
receiver frames and relative rotations — both invariants of a global
rotation.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3conv3d_tpu.core.hierarchy import (
    FrameConfig,
    Hierarchy,
    HierarchyConfig,
    build_hierarchy,
)
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.core.rotation import random_rotations
from se3conv3d_tpu.models import ClassNet, FPNSegUNet, get_model_spec

TINY_SPEC_KW = dict(
    patch_num_levels=1,
    patch_num_features=(8,),
    num_blocks=(1, 1),
    num_features=(8, 16),
    fpn_dec_feats=8,
    max_neighbors=8,
)


def _tiny_seg_spec(equivariant):
    return dataclasses.replace(
        get_model_spec(
            "FPNSegUNetMLPGeluRotEqFAUST" if equivariant else "FPNSegUNetMLPGeluFAUST"
        ),
        **TINY_SPEC_KW,
    )


def _tiny_cfg(equivariant, n_frames=2):
    return HierarchyConfig(
        init_cell_size=0.08,
        cell_sizes=(0.16, 0.32),
        capacities=(128, 64, 32),
        out_cell_size=0.1,
        out_capacity=128,
        frames=FrameConfig(n_frames=n_frames, neigh_k=8) if equivariant else None,
    )


def _build(key, equivariant, n_frames=2, b=2, n=160, c=3):
    kp, kf, kh = jax.random.split(key, 3)
    pts = jax.random.uniform(kp, (b, n, 3))
    mask = jnp.arange(n)[None] < jnp.asarray([n, n - 30])[:, None]
    feats = jax.random.normal(kf, (b, n, c))
    labels = jnp.zeros((b, n), jnp.int32)
    h, f0, out_pc, out_labels, _ = build_hierarchy(
        kh, pts, mask, feats, _tiny_cfg(equivariant, n_frames), labels
    )
    if equivariant:
        f0 = jnp.repeat(f0[:, :, None, :], n_frames, axis=2)
    return h, f0, out_pc, out_labels


@pytest.mark.parametrize("equivariant", [False, True])
def test_seg_unet_forward_shapes(equivariant):
    h, f0, out_pc, _ = _build(jax.random.PRNGKey(0), equivariant)
    spec = _tiny_seg_spec(equivariant)
    model = FPNSegUNet(spec, num_in_feats=3, num_classes=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)},
        h, f0, out_pc, train=False,
    )
    logits = model.apply(variables, h, f0, out_pc, train=False)
    assert logits.shape == (2, 128, 5)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("equivariant", [False, True])
def test_class_net_forward_shapes(equivariant):
    name = "ClassNetRotEquivMLPGELU19Former" if equivariant else "ClassNetMLPGELU19Former"
    spec = dataclasses.replace(
        get_model_spec(name),
        patch_num_levels=1,
        patch_num_features=(8,),
        num_blocks=(1, 1),
        num_features=(8, 16),
        max_neighbors=8,
    )
    h, f0, _, _ = _build(jax.random.PRNGKey(3), equivariant)
    model = ClassNet(spec, num_in_feats=3, num_classes=10)
    variables = model.init(
        {"params": jax.random.PRNGKey(4), "droppath": jax.random.PRNGKey(5)},
        h, f0, train=False,
    )
    logits = model.apply(variables, h, f0, train=False)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def _calibrated_vars(model, variables, *args):
    """Run one calibration pass (the reference's pre-process epoch)."""
    _, mutated = model.apply(
        variables, *args, train=False, calibrate=True, mutable=["calib"]
    )
    return {**variables, "calib": mutated["calib"]}


def _open_gammas(variables):
    """Set all SkipConnection gammas (init 1e-6, reference parity) to 1.0 so
    residual branches carry full signal — equivariance is structural and
    must hold for any parameter values."""

    def bump(path, leaf):
        if any(getattr(p, "key", "") == "gamma" for p in path):
            return jnp.ones_like(leaf)
        return leaf

    params = jax.tree_util.tree_map_with_path(bump, variables["params"])
    return {**variables, "params": params}


def test_calibration_updates_conv_buffers():
    h, f0, out_pc, _ = _build(jax.random.PRNGKey(6), False)
    spec = _tiny_seg_spec(False)
    model = FPNSegUNet(spec, num_in_feats=3, num_classes=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(7)}, h, f0, out_pc, train=False
    )
    _, mutated = model.apply(
        variables, h, f0, out_pc, train=False, calibrate=True, mutable=["calib"]
    )
    # First calibration step direct-sets the buffers: BQ convs get
    # 1/radius, which differs per level — no leaf stays at the 1.0 default.
    paths = jax.tree_util.tree_leaves_with_path(mutated["calib"])
    dists = [
        np.asarray(v)
        for p, v in paths
        if "norm_neigh_dist" in jax.tree_util.keystr(p)
    ]
    flags = [
        np.asarray(v) for p, v in paths if "initialized" in jax.tree_util.keystr(p)
    ]
    assert len(dists) > 0 and len(flags) > 0
    assert all(f for f in flags)
    assert any(abs(d - 1.0) > 1e-3 for d in dists)
    # Second pass applies the 0.9/0.1 EMA: same inputs -> values unchanged.
    _, mutated2 = model.apply(
        {**variables, "calib": mutated["calib"]},
        h, f0, out_pc, train=False, calibrate=True, mutable=["calib"],
    )
    for (p1, v1), (p2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(mutated["calib"]),
        jax.tree_util.tree_leaves_with_path(mutated2["calib"]),
    ):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def _rotate_world(h: Hierarchy, out_pc: PointCloud, rot: jnp.ndarray):
    """Express the same hierarchy in a rotated world: p -> p R^T (row
    vectors), frame columns -> R F."""

    def rot_pc(pc):
        frames = None if pc.frames is None else jnp.einsum("ij,bnfjk->bnfik", rot, pc.frames)
        return pc.replace(positions=pc.positions @ rot.T, frames=frames)

    return (
        h.replace(levels=tuple(rot_pc(pc) for pc in h.levels)),
        rot_pc(out_pc),
    )


def test_seg_unet_equivariance_under_global_rotation():
    h, f0, out_pc, _ = _build(jax.random.PRNGKey(8), True, n_frames=2)
    spec = _tiny_seg_spec(True)
    model = FPNSegUNet(spec, num_in_feats=3, num_classes=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(9)}, h, f0, out_pc, train=False
    )
    variables = _open_gammas(_calibrated_vars(model, variables, h, f0, out_pc))
    logits = model.apply(variables, h, f0, out_pc, train=False)
    # Calibrated logits must vary across points (guard against the
    # degenerate all-zero-conv regime).
    assert np.abs(np.asarray(logits) - np.asarray(logits)[:, :1]).max() > 1e-4

    rot = random_rotations(jax.random.PRNGKey(10), 1)[0]
    h_rot, out_rot = _rotate_world(h, out_pc, rot)
    logits_rot = model.apply(variables, h_rot, f0, out_rot, train=False)
    # Measured float32 error ~7e-9; the standard net differs by ~4e-4 on
    # the same inputs (see the sanity test below).
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_rot), atol=1e-6
    )


def test_standard_seg_unet_is_not_rotation_invariant():
    """Sanity check that the equivariance above is earned by the frames,
    not by accidental degeneracy."""
    h, f0, out_pc, _ = _build(jax.random.PRNGKey(11), False)
    spec = _tiny_seg_spec(False)
    model = FPNSegUNet(spec, num_in_feats=3, num_classes=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(12)}, h, f0, out_pc, train=False
    )
    variables = _open_gammas(_calibrated_vars(model, variables, h, f0, out_pc))
    logits = model.apply(variables, h, f0, out_pc, train=False)
    rot = random_rotations(jax.random.PRNGKey(13), 1)[0]
    h_rot, out_rot = _rotate_world(h, out_pc, rot)
    logits_rot = model.apply(variables, h_rot, f0, out_rot, train=False)
    assert np.abs(np.asarray(logits) - np.asarray(logits_rot)).max() > 1e-4


def test_provider_payload_serves_both_factories():
    """Self (multi_use) neighborhoods feed BOTH the block stack
    (conv_blocks) and the patch stem's self conv (conv).  The cached
    payload must serve every consumer: geo_t dtype follows conv_blocks,
    and a non-fused factory still finds equiv_rel/equiv_rot."""
    from se3conv3d_tpu.models.spec import NeighborhoodProvider
    from se3conv3d_tpu.nn.conv import ConvFactory

    h, _, _, _ = _build(jax.random.PRNGKey(5), True)
    spec = _tiny_seg_spec(True)

    # conv_blocks bf16-fused, conv f32-fused: cache dtype follows blocks
    spec_bf16 = dataclasses.replace(
        spec,
        conv=dataclasses.replace(spec.conv, use_fused=True),
        conv_blocks=dataclasses.replace(
            spec.conv, use_fused=True, compute_dtype="bfloat16"
        ),
    )
    nb = NeighborhoodProvider(h, spec_bf16).get(1, 1, 0.32, "ball_query", 8)
    assert nb.equiv_geo_t is not None
    assert nb.equiv_geo_t.dtype == jnp.bfloat16

    # conv non-fused (kp), conv_blocks fused: both payloads attach
    spec_mixed = dataclasses.replace(
        spec,
        conv=dataclasses.replace(spec.conv, pne_type="mlp_softmax"),
        conv_blocks=dataclasses.replace(spec.conv, use_fused=True),
    )
    nb = NeighborhoodProvider(h, spec_mixed).get(1, 1, 0.32, "ball_query", 8)
    assert nb.equiv_geo_t is not None  # for the fused block convs
    assert nb.equiv_rel is not None and nb.equiv_rot is not None  # for conv

    # cross-level (single-use) neighborhoods follow spec.conv alone
    nb = NeighborhoodProvider(h, spec_mixed).get(1, 0, 0.32, "ball_query", 8)
    assert nb.equiv_geo_t is None
    assert nb.equiv_rel is not None
