"""Trainer: full train/eval/calibration steps, single- and multi-device."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig
from se3conv3d_tpu.models import ClassNet, FPNSegUNet, get_model_spec
from se3conv3d_tpu.parallel import make_mesh, shard_batch
from se3conv3d_tpu.train import Trainer, TrainSettings, make_optimizer


def _seg_setup(equivariant=True, b=2, n=128):
    hcfg = HierarchyConfig(
        init_cell_size=0.08,
        cell_sizes=(0.16, 0.32),
        capacities=(128, 64, 32),
        out_cell_size=0.1,
        out_capacity=128,
        frames=FrameConfig(n_frames=2, neigh_k=8) if equivariant else None,
    )
    spec = dataclasses.replace(
        get_model_spec(
            "FPNSegUNetMLPGeluRotEqFAUST" if equivariant else "FPNSegUNetMLPGeluFAUST"
        ),
        patch_num_levels=1,
        patch_num_features=(8,),
        num_blocks=(1, 1),
        num_features=(8, 16),
        fpn_dec_feats=8,
        max_neighbors=8,
    )
    model = FPNSegUNet(spec, num_in_feats=3, num_classes=5)
    batch = {
        "positions": jax.random.uniform(jax.random.PRNGKey(0), (b, n, 3)),
        "mask": jnp.ones((b, n), bool),
        "features": jnp.ones((b, n, 3)),
        "labels": jax.random.randint(jax.random.PRNGKey(1), (b, n), 0, 5),
    }
    return model, hcfg, batch


@pytest.mark.parametrize("equivariant", [False, True])
def test_seg_train_step_decreases_loss(equivariant):
    model, hcfg, batch = _seg_setup(equivariant)
    trainer = Trainer(
        model,
        hcfg,
        make_optimizer(max_lr=5e-3, total_steps=20),
        TrainSettings(label_smoothing=0.2),
    )
    state = trainer.init(jax.random.PRNGKey(2), batch)
    state = trainer.calibration_step(state, batch, jax.random.PRNGKey(3))
    losses = []
    for i in range(5):
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(4))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    out = trainer.eval_step(state, batch, jax.random.PRNGKey(5))
    assert out["logits"].shape == (2, 128, 5)


@pytest.mark.slow
def test_classification_train_step():
    hcfg = HierarchyConfig(
        init_cell_size=0.08,
        cell_sizes=(0.16, 0.32),
        capacities=(128, 64, 32),
        frames=FrameConfig(n_frames=2, neigh_k=8),
    )
    spec = dataclasses.replace(
        get_model_spec("ClassNetRotEquivMLPGELU19Former"),
        patch_num_levels=1,
        patch_num_features=(8,),
        num_blocks=(1, 1),
        num_features=(8, 16),
        max_neighbors=8,
    )
    model = ClassNet(spec, num_in_feats=3, num_classes=4)
    b, n = 2, 128
    batch = {
        "positions": jax.random.uniform(jax.random.PRNGKey(0), (b, n, 3)),
        "mask": jnp.ones((b, n), bool),
        "features": jnp.ones((b, n, 3)),
        "labels": jnp.asarray([0, 3]),
    }
    trainer = Trainer(
        model,
        hcfg,
        make_optimizer(max_lr=5e-3, total_steps=20),
        TrainSettings(label_smoothing=0.0, task="classification"),
    )
    state = trainer.init(jax.random.PRNGKey(1), batch)
    state = trainer.calibration_step(state, batch, jax.random.PRNGKey(2))
    losses = []
    for _ in range(10):
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # 2-sample task, tiny net: must be overfitting by step 10 (individual
    # steps are noisy under drop-path + the 1cycle warmup).
    assert min(losses[5:]) < losses[0]


@pytest.mark.slow
def test_scan_scenes_matches_manual_accumulation():
    """``TrainSettings.scan_scenes`` (in-graph scene-sequential gradient
    accumulation, B=1 activation memory) must produce exactly the
    count-weighted accumulated update: verified against an explicit
    per-scene replication with the same rng folding."""
    import optax

    model, hcfg, batch = _seg_setup(True, b=2, n=96)
    tx = make_optimizer(max_lr=5e-3, total_steps=20)
    settings = TrainSettings(label_smoothing=0.2, scan_scenes=True)
    trainer = Trainer(model, hcfg, tx, settings)
    state = trainer.init(jax.random.PRNGKey(2), batch)
    state = trainer.calibration_step(state, batch, jax.random.PRNGKey(3))
    rng = jax.random.PRNGKey(4)
    new_state, metrics = trainer.train_step(state, batch, rng)

    # manual replication of the scan body (same rng structure)
    rng_h, rng_d = jax.random.split(jax.random.fold_in(rng, state.step))
    bstats = state.batch_stats
    gsum = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), state.params
    )
    tsum = csum = 0.0
    for i in range(2):
        sub = {k: v[i : i + 1] for k, v in batch.items()}
        h, f0, out_pc, out_labels, _ = trainer._build(
            jax.random.fold_in(rng_h, i), sub
        )

        def loss_fn(params, bstats=bstats, h=h, f0=f0, out_pc=out_pc,
                    out_labels=out_labels, i=i):
            out, mutated = model.apply(
                {
                    "params": params,
                    "batch_stats": bstats,
                    "calib": state.calib,
                },
                h, f0, out_pc, train=True, mutable=["batch_stats"],
                rngs={"droppath": jax.random.fold_in(rng_d, i)},
            )
            total, count = trainer._loss_parts(out, out_labels, out_pc)
            return total, (count, mutated)

        (total, (count, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        bstats = mutated["batch_stats"]
        gsum = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(jnp.float32), gsum, grads
        )
        tsum += float(total)
        csum += float(count)

    grads = jax.tree_util.tree_map(
        lambda g, p: (g / csum).astype(p.dtype), gsum, state.params
    )
    updates, _ = tx.update(grads, state.opt_state, state.params)
    exp_params = optax.apply_updates(state.params, updates)

    np.testing.assert_allclose(float(metrics["loss"]), tsum / csum, rtol=1e-5)
    for (_, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(new_state.params),
        jax.tree_util.tree_leaves_with_path(exp_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6
        )
    # batch_stats followed the sequential (accum_grads) semantics
    for (_, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(new_state.batch_stats),
        jax.tree_util.tree_leaves_with_path(bstats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-7
        )


def test_scan_scenes_trains():
    """scan_scenes end-to-end: loss decreases like the batched path."""
    model, hcfg, batch = _seg_setup(True, b=2, n=96)
    trainer = Trainer(
        model,
        hcfg,
        make_optimizer(max_lr=5e-3, total_steps=20),
        TrainSettings(label_smoothing=0.2, scan_scenes=True),
    )
    state = trainer.init(jax.random.PRNGKey(2), batch)
    state = trainer.calibration_step(state, batch, jax.random.PRNGKey(3))
    losses = []
    for _ in range(5):
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(4))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_scan_scenes_classification_matches_manual():
    """The scan path's count-weighting also covers classification
    (per-example counts via the filler example_mask)."""
    import optax

    hcfg = HierarchyConfig(
        init_cell_size=0.08,
        cell_sizes=(0.16, 0.32),
        capacities=(96, 48, 24),
        frames=FrameConfig(n_frames=2, neigh_k=8),
    )
    spec = dataclasses.replace(
        get_model_spec("ClassNetRotEquivMLPGELU19Former"),
        patch_num_levels=1,
        patch_num_features=(8,),
        num_blocks=(1, 1),
        num_features=(8, 16),
        max_neighbors=8,
    )
    model = ClassNet(spec, num_in_feats=3, num_classes=4)
    b, n = 2, 96
    batch = {
        "positions": jax.random.uniform(jax.random.PRNGKey(0), (b, n, 3)),
        "mask": jnp.ones((b, n), bool),
        "features": jnp.ones((b, n, 3)),
        "labels": jnp.asarray([0, 3]),
    }
    tx = make_optimizer(max_lr=5e-3, total_steps=20)
    trainer = Trainer(
        model, hcfg, tx,
        TrainSettings(task="classification", scan_scenes=True),
    )
    state = trainer.init(jax.random.PRNGKey(1), batch)
    state = trainer.calibration_step(state, batch, jax.random.PRNGKey(2))
    rng = jax.random.PRNGKey(3)
    new_state, metrics = trainer.train_step(state, batch, rng)

    rng_h, rng_d = jax.random.split(jax.random.fold_in(rng, state.step))
    bstats = state.batch_stats
    gsum = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), state.params
    )
    tsum = csum = 0.0
    for i in range(b):
        sub = {k: v[i : i + 1] for k, v in batch.items()}
        h, f0, out_pc, out_labels, _ = trainer._build(
            jax.random.fold_in(rng_h, i), sub
        )

        def loss_fn(params, bstats=bstats, h=h, f0=f0, out_pc=out_pc,
                    out_labels=out_labels, i=i):
            out, mutated = model.apply(
                {
                    "params": params,
                    "batch_stats": bstats,
                    "calib": state.calib,
                },
                h, f0, train=True, mutable=["batch_stats"],
                rngs={"droppath": jax.random.fold_in(rng_d, i)},
            )
            total, count = trainer._loss_parts(out, out_labels, out_pc)
            return total, (count, mutated)

        (total, (count, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        bstats = mutated["batch_stats"]
        gsum = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(jnp.float32), gsum, grads
        )
        tsum += float(total)
        csum += float(count)

    grads = jax.tree_util.tree_map(
        lambda g, p: (g / csum).astype(p.dtype), gsum, state.params
    )
    updates, _ = tx.update(grads, state.opt_state, state.params)
    exp_params = optax.apply_updates(state.params, updates)
    assert csum == b  # one valid example per scene
    np.testing.assert_allclose(float(metrics["loss"]), tsum / csum, rtol=1e-5)
    for (_, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(new_state.params),
        jax.tree_util.tree_leaves_with_path(exp_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6
        )


def test_seg_train_step_on_8_device_mesh():
    """Data-parallel sharded step on the virtual CPU mesh; must match the
    single-device result (same total batch, replicated state)."""
    model, hcfg, batch = _seg_setup(False, b=8, n=96)
    tx = make_optimizer(max_lr=1e-3, total_steps=10)
    settings = TrainSettings(label_smoothing=0.2)

    mesh = make_mesh(8)
    trainer_m = Trainer(model, hcfg, tx, settings, mesh=mesh)
    sharded = shard_batch(mesh, batch)
    state_m = trainer_m.init(jax.random.PRNGKey(7), sharded)
    state_m = trainer_m.calibration_step(state_m, sharded, jax.random.PRNGKey(8))
    state_m, metrics_m = trainer_m.train_step(state_m, sharded, jax.random.PRNGKey(9))

    trainer_1 = Trainer(model, hcfg, tx, settings)
    state_1 = trainer_1.init(jax.random.PRNGKey(7), batch)
    state_1 = trainer_1.calibration_step(state_1, batch, jax.random.PRNGKey(8))
    state_1, metrics_1 = trainer_1.train_step(state_1, batch, jax.random.PRNGKey(9))

    np.testing.assert_allclose(
        float(metrics_m["loss"]), float(metrics_1["loss"]), rtol=1e-4
    )
    # Parameters after the sharded update match the single-device update up
    # to cross-device reduction reordering (measured max rel diff ~3e-4).
    for (p1, a), (p2, b_) in zip(
        jax.tree_util.tree_leaves_with_path(state_m.params),
        jax.tree_util.tree_leaves_with_path(state_1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-3
        )


@pytest.mark.slow
def test_seg_train_step_on_2d_data_points_mesh():
    """(data=4, points=2) mesh: per-point arrays shard on BOTH axes (the
    sequence-parallel analogue); GSPMD inserts the cross-shard gather
    collectives.  Must match the single-device step."""
    model, hcfg, batch = _seg_setup(False, b=4, n=96)
    tx = make_optimizer(max_lr=1e-3, total_steps=10)
    settings = TrainSettings(label_smoothing=0.2)

    mesh = make_mesh(8, points=2)
    assert mesh.axis_names == ("data", "points")
    trainer_m = Trainer(model, hcfg, tx, settings, mesh=mesh)
    sharded = shard_batch(mesh, batch)
    assert "points" in str(sharded["positions"].sharding.spec)
    state_m = trainer_m.init(jax.random.PRNGKey(7), sharded)
    state_m = trainer_m.calibration_step(state_m, sharded, jax.random.PRNGKey(8))
    state_m, metrics_m = trainer_m.train_step(state_m, sharded, jax.random.PRNGKey(9))

    trainer_1 = Trainer(model, hcfg, tx, settings)
    state_1 = trainer_1.init(jax.random.PRNGKey(7), batch)
    state_1 = trainer_1.calibration_step(state_1, batch, jax.random.PRNGKey(8))
    state_1, metrics_1 = trainer_1.train_step(state_1, batch, jax.random.PRNGKey(9))

    np.testing.assert_allclose(
        float(metrics_m["loss"]), float(metrics_1["loss"]), rtol=1e-4
    )
    for (_, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(state_m.params),
        jax.tree_util.tree_leaves_with_path(state_1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-3
        )
