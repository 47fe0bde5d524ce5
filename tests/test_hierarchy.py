"""Hierarchy builder: shapes, masks, frames, output cloud, jit."""
import jax
import jax.numpy as jnp
import numpy as np

from se3conv3d_tpu.core.hierarchy import (
    FrameConfig,
    HierarchyConfig,
    build_hierarchy,
)


def _inputs(key, b=2, n=256):
    kp, kf = jax.random.split(key)
    pts = jax.random.uniform(kp, (b, n, 3))
    mask = jnp.arange(n)[None] < jnp.asarray([n, n - 40])[:, None]
    feats = jax.random.normal(kf, (b, n, 4))
    labels = jnp.arange(n)[None].repeat(b, 0) % 7
    return pts, mask, feats, labels


CFG = HierarchyConfig(
    init_cell_size=0.05,
    cell_sizes=(0.1, 0.2, 0.4),
    capacities=(256, 128, 64, 32),
    out_cell_size=0.08,
    out_capacity=256,
    frames=FrameConfig(n_frames=2, pca=True, neigh_k=8),
)


def test_build_hierarchy_shapes_and_masks():
    pts, mask, feats, labels = _inputs(jax.random.PRNGKey(0))
    h, f0, out_pc, out_labels, raw_to_out = build_hierarchy(
        jax.random.PRNGKey(1), pts, mask, feats, CFG, labels
    )
    assert h.num_levels == 4
    assert [pc.capacity for pc in h.levels] == [256, 128, 64, 32]
    counts = [np.asarray(pc.num_valid()) for pc in h.levels]
    for prev, nxt in zip(counts[:-1], counts[1:]):
        assert (nxt <= prev).all() and (nxt > 0).all()
    assert f0.shape == (2, 256, 4)
    assert out_pc.capacity == 256
    assert out_labels.shape == (2, 256)
    # Every level carries 2 orthonormal det=+1 frames.
    for pc in list(h.levels) + [out_pc]:
        fr = np.asarray(pc.frames)
        assert fr.shape[2:] == (2, 3, 3)
        m = np.asarray(pc.mask)
        ident = np.einsum("bnfij,bnfkj->bnfik", fr, fr)
        np.testing.assert_allclose(
            ident[m], np.broadcast_to(np.eye(3), ident[m].shape), atol=1e-4
        )
        det = np.linalg.det(fr)
        np.testing.assert_allclose(det[m], 1.0, atol=1e-4)


def test_output_cloud_picks_real_points():
    pts, mask, feats, labels = _inputs(jax.random.PRNGKey(2))
    h, _, out_pc, out_labels, raw_to_out = build_hierarchy(
        jax.random.PRNGKey(3), pts, mask, feats, CFG, labels
    )
    for b in range(2):
        m = np.asarray(out_pc.mask[b])
        chosen = np.asarray(raw_to_out.chosen_idx[b])[m]
        src_valid = np.asarray(mask[b])
        assert src_valid[chosen].all()
        np.testing.assert_allclose(
            np.asarray(out_pc.positions[b])[m], np.asarray(pts[b])[chosen], atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(out_labels[b])[m], np.asarray(labels[b])[chosen]
        )


def test_build_hierarchy_jits():
    pts, mask, feats, labels = _inputs(jax.random.PRNGKey(4))
    fn = jax.jit(lambda k, p, m, f, l: build_hierarchy(k, p, m, f, CFG, l))
    h, f0, out_pc, out_labels, _ = fn(jax.random.PRNGKey(5), pts, mask, feats, labels)
    assert h.levels[-1].positions.shape == (2, 32, 3)


def test_standard_hierarchy_no_frames_no_out():
    cfg = HierarchyConfig(
        init_cell_size=0.05,
        cell_sizes=(0.1, 0.2),
        capacities=(256, 128, 64),
    )
    pts, mask, feats, labels = _inputs(jax.random.PRNGKey(6))
    h, f0, out_pc, out_labels, raw_to_out = build_hierarchy(
        jax.random.PRNGKey(7), pts, mask, feats, cfg, labels
    )
    assert all(pc.frames is None for pc in h.levels)
    assert out_pc.frames is None and raw_to_out is None
    # Output cloud is the raw cloud itself.
    np.testing.assert_allclose(np.asarray(out_pc.positions), np.asarray(pts))
    np.testing.assert_array_equal(np.asarray(out_labels), np.asarray(labels))


def test_hierarchy_pool_upsample_roundtrip():
    pts, mask, feats, _ = _inputs(jax.random.PRNGKey(8))
    h, f0, *_ = build_hierarchy(jax.random.PRNGKey(9), pts, mask, feats, CFG)
    pooled = h.pool(0, f0)
    up = h.upsample(0, pooled)
    assert pooled.shape == (2, 128, 4)
    assert up.shape == (2, 256, 4)
    # Cells with a single member round-trip exactly.
    cell_id = np.asarray(h.maps[0].cell_id)
    src_mask = np.asarray(h.maps[0].src_mask)
    for b in range(2):
        ids, counts = np.unique(cell_id[b][src_mask[b]], return_counts=True)
        singles = set(ids[counts == 1])
        for i in np.nonzero(src_mask[b])[0]:
            if cell_id[b, i] in singles:
                np.testing.assert_allclose(
                    np.asarray(up[b, i]), np.asarray(f0[b, i]), atol=1e-5
                )


def test_raw_out_cloud_attaches_frames_without_spacing_hint(monkeypatch):
    """out_cell_size=None means the RAW cloud is the output; its spacing
    is unknown (denser than any level), so the frame attach must get NO
    grid hint (exact brute-force kNN) — a level-derived hint over-sizes
    the grid cells and silently costs recall on 8k-32k raw clouds."""
    import dataclasses

    from se3conv3d_tpu.core import hierarchy as H

    captured = []
    orig = H.attach_frames

    def spy(key, pc, cfg, spacing=None):
        captured.append(spacing)
        return orig(key, pc, cfg, spacing=spacing)

    monkeypatch.setattr(H, "attach_frames", spy)
    pts, mask, feats, _ = _inputs(jax.random.PRNGKey(3))

    build_hierarchy(jax.random.PRNGKey(4), pts, mask, feats, CFG)
    assert captured[-1] is not None  # subsampled out cloud: hinted
    np.testing.assert_allclose(captured[-1], 1.3 * 0.08)

    captured.clear()
    raw_cfg = dataclasses.replace(CFG, out_cell_size=None, out_capacity=None)
    build_hierarchy(jax.random.PRNGKey(4), pts, mask, feats, raw_cfg)
    assert captured[-1] is None  # raw out cloud: no hint, brute force
