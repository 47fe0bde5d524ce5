"""FPS subsample, attention conv layers, plain SegUNet, global frames,
scannet_io, logging utilities."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3conv3d_tpu.core import (
    FrameConfig,
    HierarchyConfig,
    attach_frames,
    build_hierarchy,
    fps_subsample_cloud,
    knn_neighborhood,
)
from se3conv3d_tpu.core.pointcloud import PointCloud
from se3conv3d_tpu.models import SegUNet, get_model_spec
from se3conv3d_tpu.nn import LoRAttConv, MultiHeadAttConv
from se3conv3d_tpu.utils import (
    SCANNET_CLASS_IDS_20,
    save_scannet20_scene_labels,
)
from se3conv3d_tpu.utils.logging import LoggingConfig, LoggingManager, StepTimer


def _cloud(key, b=2, n=64, valid=None):
    pts = jax.random.uniform(key, (b, n, 3))
    mask = (
        jnp.ones((b, n), bool)
        if valid is None
        else jnp.arange(n)[None] < jnp.asarray(valid)[:, None]
    )
    return PointCloud(positions=pts, mask=mask)


def test_fps_selects_spread_points():
    pc = _cloud(jax.random.PRNGKey(0), b=2, n=128, valid=[128, 100])
    sub, fmap = fps_subsample_cloud(pc, 16)
    assert sub.positions.shape == (2, 16, 3)
    for b in range(2):
        ids = np.asarray(fmap.ids[b])
        valid_n = int(np.asarray(pc.mask[b]).sum())
        assert (ids < valid_n).all()  # never selects padded points
        assert len(np.unique(ids)) == 16  # all distinct
        # FPS spreads better than random: its min pairwise distance should
        # beat the min pairwise distance of the first 16 points.
        pts = np.asarray(pc.positions[b])
        sel = pts[ids]

        def min_pair(x):
            d = np.linalg.norm(x[:, None] - x[None], axis=-1)
            return d[~np.eye(len(x), dtype=bool)].min()

        assert min_pair(sel) > min_pair(pts[:16])


def test_fps_upsample_roundtrip_for_selected():
    pc = _cloud(jax.random.PRNGKey(1), b=1, n=64)
    sub, fmap = fps_subsample_cloud(pc, 8)
    vals = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 5))
    up = fmap.upsample(vals)
    assert up.shape == (1, 64, 5)
    # Each selected point maps back to its own value.
    for s, idx in enumerate(np.asarray(fmap.ids[0])):
        np.testing.assert_allclose(np.asarray(up[0, idx]), np.asarray(vals[0, s]))


@pytest.mark.parametrize("cls", [MultiHeadAttConv, LoRAttConv])
def test_attention_conv_layers(cls):
    pc = _cloud(jax.random.PRNGKey(3), b=2, n=48, valid=[48, 32])
    nb = knn_neighborhood(pc, pc, 8)
    feats = jax.random.normal(jax.random.PRNGKey(4), (2, 48, 16))
    layer = cls(in_features=16, out_features=12, num_basis=8, num_heads=4)
    variables = layer.init({"params": jax.random.PRNGKey(5)}, pc, pc, feats, nb)
    out = layer.apply(variables, pc, pc, feats, nb)
    assert out.shape == (2, 48, 12)
    assert np.isfinite(np.asarray(out)).all()
    # Calibration protocol matches PNEConv.
    _, upd = layer.apply(
        variables, pc, pc, feats, nb, calibrate=True, mutable=["calib"]
    )
    assert bool(jax.tree_util.tree_leaves(upd["calib"])[0] is not None)


@pytest.mark.slow
def test_plain_seg_unet_forward():
    cfg = HierarchyConfig(
        init_cell_size=0.08,
        cell_sizes=(0.16, 0.32),
        capacities=(128, 64, 32),
        out_cell_size=0.1,
        out_capacity=128,
        frames=FrameConfig(n_frames=2, neigh_k=8),
    )
    kp, kf, kh = jax.random.split(jax.random.PRNGKey(6), 3)
    pts = jax.random.uniform(kp, (2, 160, 3))
    mask = jnp.ones((2, 160), bool)
    feats = jnp.ones((2, 160, 3))
    h, f0, out_pc, _, _ = build_hierarchy(kh, pts, mask, feats, cfg)
    f0 = jnp.repeat(f0[:, :, None, :], 2, axis=2)
    spec = dataclasses.replace(
        get_model_spec("FPNSegUNetMLPGeluRotEqFAUST"),
        patch_num_levels=1,
        patch_num_features=(8,),
        num_blocks=(1, 1),
        num_features=(8, 16),
        seg_head_feats=8,
        max_neighbors=8,
    )
    model = SegUNet(spec, num_in_feats=3, num_classes=5)
    variables = model.init({"params": jax.random.PRNGKey(7)}, h, f0, out_pc, train=False)
    logits = model.apply(variables, h, f0, out_pc, train=False)
    assert logits.shape == (2, 128, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_global_frames():
    pc = _cloud(jax.random.PRNGKey(8), b=2, n=64, valid=[64, 50])
    cfg = FrameConfig(n_frames=2, pca=True, global_frames=True)
    out = attach_frames(jax.random.PRNGKey(9), pc, cfg)
    fr = np.asarray(out.frames)
    assert fr.shape == (2, 64, 2, 3, 3)
    # Every point of an example carries the same (global) frames.
    np.testing.assert_allclose(fr[:, 1:], np.broadcast_to(fr[:, :1], fr[:, 1:].shape))
    ident = np.einsum("bnfij,bnfkj->bnfik", fr, fr)
    np.testing.assert_allclose(
        ident, np.broadcast_to(np.eye(3), ident.shape), atol=1e-5
    )


def test_scannet_io_label_remap(tmp_path):
    labels = np.array([0, 1, 5, 20])
    path = tmp_path / "labels.txt"
    save_scannet20_scene_labels(path, labels)
    written = np.loadtxt(path, dtype=np.int64)
    np.testing.assert_array_equal(written, SCANNET_CLASS_IDS_20[labels])


def test_logging_manager_and_timer(tmp_path):
    mgr = LoggingManager(LoggingConfig(name="t", log_file=str(tmp_path / "log.txt")))
    mgr.get_logger().info("hello")
    assert (tmp_path / "log.txt").read_text().strip().endswith("hello")
    timer = StepTimer()
    dt = timer.mark("phase_a")
    assert dt >= 0.0 and "phase_a" in timer.phases


def test_rotate_hierarchy_preserves_structure():
    from se3conv3d_tpu.core.hierarchy import (
        build_hierarchy,
        random_rotate_hierarchy,
    )

    cfg = HierarchyConfig(
        init_cell_size=0.08,
        cell_sizes=(0.16,),
        capacities=(64, 32),
        frames=FrameConfig(n_frames=2, neigh_k=8),
    )
    pts = jax.random.uniform(jax.random.PRNGKey(20), (1, 64, 3))
    mask = jnp.ones((1, 64), bool)
    h, *_ = build_hierarchy(jax.random.PRNGKey(21), pts, mask, None, cfg)
    h_rot, rot = random_rotate_hierarchy(jax.random.PRNGKey(22), h)
    for lvl, lvl_rot in zip(h.levels, h_rot.levels):
        # Pairwise distances preserved.
        d0 = np.linalg.norm(
            np.asarray(lvl.positions[0, :8, None] - lvl.positions[0, None, :8]),
            axis=-1,
        )
        d1 = np.linalg.norm(
            np.asarray(
                lvl_rot.positions[0, :8, None] - lvl_rot.positions[0, None, :8]
            ),
            axis=-1,
        )
        np.testing.assert_allclose(d0, d1, atol=1e-5)
        # Frames rotate with the cloud: R @ F.
        np.testing.assert_allclose(
            np.asarray(lvl_rot.frames),
            np.einsum("ij,bnfjk->bnfik", np.asarray(rot), np.asarray(lvl.frames)),
            atol=1e-6,
        )


@pytest.mark.slow
def test_class_net_global_equiv_featurevector():
    from se3conv3d_tpu.models import ClassNet

    cfg = HierarchyConfig(
        init_cell_size=0.08,
        cell_sizes=(0.16, 0.32, 0.5),  # one extra level beyond the trunk
        capacities=(128, 64, 32, 16),
        frames=FrameConfig(n_frames=2, neigh_k=8),
    )
    kp, kh = jax.random.split(jax.random.PRNGKey(23))
    pts = jax.random.uniform(kp, (2, 160, 3))
    mask = jnp.ones((2, 160), bool)
    feats = jnp.ones((2, 160, 3))
    h, f0, *_ = build_hierarchy(kh, pts, mask, feats, cfg)
    f0 = jnp.repeat(f0[:, :, None, :], 2, axis=2)
    spec = dataclasses.replace(
        get_model_spec("ClassNetRotEquivMLPGELU19Former"),
        patch_num_levels=1,
        patch_num_features=(8,),
        num_blocks=(1, 1),
        num_features=(8, 16),
        max_neighbors=8,
        global_equiv_featurevector=True,
    )
    model = ClassNet(spec, num_in_feats=3, num_classes=4)
    variables = model.init({"params": jax.random.PRNGKey(24)}, h, f0, train=False)
    out = model.apply(variables, h, f0, train=False)
    # Equivariant feature vector: per point x frame, 2*C channels.
    assert out.shape == (2, 16, 2, 32)
    assert np.isfinite(np.asarray(out)).all()
