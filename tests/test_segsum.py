"""Sorted segment-sum backward: kernel correctness + conv-grad parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3conv3d_tpu.ops.pallas.segsum import blocked_cumsum, sorted_segment_sum


def test_blocked_cumsum_matches_numpy():
    rng = np.random.default_rng(0)
    for e, c, blk in [(16, 8, 8), (1000, 128, 256), (513, 32, 128)]:
        x = rng.standard_normal((e, c)).astype(np.float32)
        out = blocked_cumsum(jnp.asarray(x), block=blk)
        np.testing.assert_allclose(
            np.asarray(out), np.cumsum(x, axis=0), rtol=1e-5, atol=1e-4
        )


def test_blocked_cumsum_bf16_payload_f32_accum():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((700, 64)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    out = blocked_cumsum(xb, block=128)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out), np.cumsum(np.asarray(xb, np.float32), axis=0),
        rtol=1e-4, atol=1e-2,
    )


def test_sorted_segment_sum_matches_scatter_oracle():
    rng = np.random.default_rng(2)
    e, c, n = 2048, 64, 300
    segs = np.sort(rng.integers(0, n, e)).astype(np.int32)
    data = rng.standard_normal((e, c)).astype(np.float32)
    rs = np.searchsorted(segs, np.arange(n), side="left").astype(np.int32)
    re = np.searchsorted(segs, np.arange(n), side="right").astype(np.int32)
    out = sorted_segment_sum(jnp.asarray(data), jnp.asarray(rs), jnp.asarray(re))
    oracle = np.zeros((n, c), np.float32)
    np.add.at(oracle, segs, data)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-3)


def test_backward_sort_tables_layout():
    from se3conv3d_tpu.core.neighborhoods import Neighborhood
    from se3conv3d_tpu.ops.pne_conv import backward_sort_tables

    rng = np.random.default_rng(3)
    b, m, k, n = 2, 40, 4, 32
    idx = rng.integers(0, n, (b, m, k)).astype(np.int32)
    neigh = Neighborhood(
        idx=jnp.asarray(idx),
        mask=jnp.ones((b, m, k), bool),
        query_mask=jnp.ones((b, m), bool),
    )
    ns = backward_sort_tables(neigh, n, m_chunk=16)  # 40 -> 3 chunks of 16
    assert ns.bwd_perm.shape == (b, 3, 16 * k)
    assert ns.bwd_run_start.shape == (b, 3, n)
    # run bounds partition each chunk's sorted edges
    perm = np.asarray(ns.bwd_perm)
    rs, re = np.asarray(ns.bwd_run_start), np.asarray(ns.bwd_run_end)
    idx_pad = np.pad(idx, ((0, 0), (0, 8), (0, 0)))
    for bi in range(b):
        for ci in range(3):
            flat = idx_pad[bi, ci * 16 : (ci + 1) * 16].reshape(-1)
            srt = flat[perm[bi, ci]]
            assert (np.diff(srt) >= 0).all()
            for ni in range(n):
                seg = srt[rs[bi, ci, ni] : re[bi, ci, ni]]
                assert (seg == ni).all()
                assert (srt == ni).sum() == re[bi, ci, ni] - rs[bi, ci, ni]


@pytest.mark.parametrize("m", [48, 200])  # 200 > m_chunk=64 -> scan path
def test_fused_conv_sorted_backward_matches_scatter(m, monkeypatch):
    """The 'sorted' backward mode must reproduce the scatter-mode conv
    gradients (same f32 accumulation, different reduction order)."""
    import se3conv3d_tpu.ops.pne_conv as pc_ops
    from se3conv3d_tpu.core import neighborhoods as NB
    from se3conv3d_tpu.core import rotation as R
    from se3conv3d_tpu.core.pointcloud import PointCloud

    key = jax.random.PRNGKey(10)
    f = 2
    pos = jax.random.normal(key, (1, m, 3))
    frames = R.random_rotations(jax.random.PRNGKey(11), m * f).reshape(
        1, m, f, 3, 3
    )
    pc = PointCloud(positions=pos, mask=jnp.ones((1, m), bool), frames=frames)
    nb = NB.knn_neighborhood(pc, pc, k=6)
    feats = jax.random.normal(jax.random.PRNGKey(12), (1, m, f, 5))
    pa = jax.random.normal(jax.random.PRNGKey(13), (9, 8)) * 0.3
    pb = jax.random.normal(jax.random.PRNGKey(14), (8,)) * 0.02
    w = jax.random.normal(jax.random.PRNGKey(15), (5, 8, 7)) * 0.1

    def loss(x, pa_, pb_, w_):
        out = pc_ops.fused_equiv_conv(
            pc, pc, nb, x, pa_, pb_, w_,
            jnp.asarray(3.0), jnp.asarray(0.2), m_chunk=64,
        )
        return jnp.sum(out * out)

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))

    monkeypatch.setattr(pc_ops, "BWD_SCATTER_MODE", "scatter")
    v_s, g_s = vg(feats, pa, pb, w)
    monkeypatch.setattr(pc_ops, "BWD_SCATTER_MODE", "sorted")
    v_o, g_o = vg(feats, pa, pb, w)

    np.testing.assert_allclose(float(v_s), float(v_o), rtol=1e-5)
    for a, b_ in zip(g_s, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4
        )


@pytest.mark.slow
def test_full_model_fused_sorted_train_step(monkeypatch):
    """Integration: FPNSegUNet with the fused kernel forced on
    (interpret-mode Pallas on CPU) and the 'sorted' backward — provider
    geometry + sort-table caching, scan-chunked conv, sorted reduction —
    must match the scatter-mode step."""
    import dataclasses

    import se3conv3d_tpu.ops.pne_conv as pc_ops
    from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig
    from se3conv3d_tpu.models import FPNSegUNet, get_model_spec
    from se3conv3d_tpu.train import Trainer, TrainSettings, make_optimizer

    hcfg = HierarchyConfig(
        init_cell_size=0.08,
        cell_sizes=(0.16, 0.32),
        capacities=(96, 48, 24),
        out_cell_size=0.1,
        out_capacity=96,
        frames=FrameConfig(n_frames=2, neigh_k=8),
    )
    spec = dataclasses.replace(
        get_model_spec("FPNSegUNetMLPGeluRotEqFAUST"),
        patch_num_levels=1, patch_num_features=(8,),
        num_blocks=(1, 1), num_features=(8, 16), fpn_dec_feats=8,
        max_neighbors=8,
    )
    spec = dataclasses.replace(
        spec, conv=dataclasses.replace(spec.conv, use_fused=True)
    )
    model = FPNSegUNet(spec, num_in_feats=3, num_classes=5)
    batch = {
        "positions": jax.random.uniform(jax.random.PRNGKey(0), (1, 96, 3)),
        "mask": jnp.ones((1, 96), bool),
        "features": jnp.ones((1, 96, 3)),
        "labels": jax.random.randint(jax.random.PRNGKey(1), (1, 96), 0, 5),
    }

    def run_one():
        trainer = Trainer(
            model, hcfg, make_optimizer(max_lr=1e-3, total_steps=10),
            TrainSettings(label_smoothing=0.2),
        )
        state = trainer.init(jax.random.PRNGKey(2), batch)
        state = trainer.calibration_step(state, batch, jax.random.PRNGKey(3))
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(4))
        return state, float(metrics["loss"])

    monkeypatch.setattr(pc_ops, "BWD_SCATTER_MODE", "sorted")
    state_s, loss_s = run_one()
    assert np.isfinite(loss_s)

    monkeypatch.setattr(pc_ops, "BWD_SCATTER_MODE", "scatter")
    state_x, loss_x = run_one()
    np.testing.assert_allclose(loss_s, loss_x, rtol=1e-5)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state_s.params),
        jax.tree_util.tree_leaves(state_x.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-4
        )


def test_stale_sort_tables_with_matching_chunk_count_are_rebuilt(monkeypatch):
    """Cached sorted-edge tables whose chunk COUNT matches but whose
    per-chunk edge length differs from the conv's m_chunk must be
    rebuilt, not reused — reuse would mis-permute the backward silently.
    m=96: tables at m_chunk=32 (3 chunks of 32) vs a conv at m_chunk=40
    (3 chunks of 40)."""
    import se3conv3d_tpu.ops.pne_conv as pc_ops
    from se3conv3d_tpu.core import neighborhoods as NB
    from se3conv3d_tpu.core import rotation as R
    from se3conv3d_tpu.core.pointcloud import PointCloud

    m, f, k = 96, 2, 6
    pos = jax.random.normal(jax.random.PRNGKey(20), (1, m, 3))
    frames = R.random_rotations(jax.random.PRNGKey(21), m * f).reshape(
        1, m, f, 3, 3
    )
    pc = PointCloud(positions=pos, mask=jnp.ones((1, m), bool), frames=frames)
    nb = NB.knn_neighborhood(pc, pc, k=k)
    stale = pc_ops.backward_sort_tables(nb, m, m_chunk=32)
    assert stale.bwd_perm.shape[1:] == (3, 32 * k)

    monkeypatch.setattr(pc_ops, "BWD_SCATTER_MODE", "sorted")
    # the validity check must reject the 32-edge-chunk tables at m_chunk=40
    tabs = pc_ops._sort_tables_for(stale, m, m, m_chunk=40)
    assert tabs[0].shape[1:] == (3, 40 * k)

    feats = jax.random.normal(jax.random.PRNGKey(22), (1, m, f, 5))
    pa = jax.random.normal(jax.random.PRNGKey(23), (9, 8)) * 0.3
    pb = jax.random.normal(jax.random.PRNGKey(24), (8,)) * 0.02
    w = jax.random.normal(jax.random.PRNGKey(25), (5, 8, 7)) * 0.1

    def loss(neigh, mc, x):
        out = pc_ops.fused_equiv_conv(
            pc, pc, neigh, x, pa, pb, w,
            jnp.asarray(3.0), jnp.asarray(0.2), m_chunk=mc,
        )
        return jnp.sum(out * out)

    g_stale = jax.grad(loss, argnums=2)(stale, 40, feats)
    monkeypatch.setattr(pc_ops, "BWD_SCATTER_MODE", "scatter")
    g_ref = jax.grad(loss, argnums=2)(nb, 40, feats)
    np.testing.assert_allclose(
        np.asarray(g_stale), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )
