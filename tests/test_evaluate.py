"""Voting evaluators: full-resolution accumulation, valid-id mapping,
segment smoothing, classification ensembling."""
import numpy as np
import jax
import jax.numpy as jnp

from se3conv3d_tpu.train.evaluate import (
    ClassificationVoter,
    SegmentationVoter,
    segment_smooth,
)


def test_segment_smooth_means_within_segments():
    logits = np.array([[1.0, 0.0], [3.0, 0.0], [0.0, 2.0], [0.0, 4.0]])
    segments = np.array([0, 0, 1, 1])
    out = segment_smooth(logits, segments)
    np.testing.assert_allclose(out[0], [2.0, 0.0])
    np.testing.assert_allclose(out[1], [2.0, 0.0])
    np.testing.assert_allclose(out[2], [0.0, 3.0])
    np.testing.assert_allclose(out[3], [0.0, 3.0])


class _FakeTrainer:
    """Eval step that 'predicts' class = floor(x coordinate) for each
    output point; exercises the voter's out_idx + valid_ids mapping."""

    def __init__(self, capacity, num_classes, subsample=2):
        self.capacity = capacity
        self.num_classes = num_classes
        self.subsample = subsample

    def eval_step(self, state, batch, rng):
        pos = batch["positions"][0]
        n = pos.shape[0]
        # Output cloud: every `subsample`-th input point.
        out_idx = np.arange(0, self.capacity) * self.subsample
        out_idx = np.clip(out_idx, 0, n - 1)
        mask = np.arange(self.capacity) < (
            int(batch["mask"][0].sum()) // self.subsample
        )
        labels = np.floor(pos[out_idx, 0]).astype(int) % self.num_classes
        logits = np.eye(self.num_classes)[labels] * 10.0
        return {
            "logits": jnp.asarray(logits[None]),
            "mask": jnp.asarray(mask[None]),
            "out_idx": jnp.asarray(out_idx[None]),
            "labels": jnp.zeros((1, self.capacity), jnp.int32),
            "loss": jnp.zeros(()),
        }


class _FakeDataset:
    def __init__(self, n_full=40, crop_to=32):
        rng = np.random.default_rng(0)
        self.full_pts = rng.uniform(0, 4, (n_full, 3)).astype(np.float32)
        self.crop_to = crop_to
        self.epochs = 0

    def __len__(self):
        return 1

    def get_num_pts(self, i):
        return len(self.full_pts)

    def increase_epoch_counter(self):
        self.epochs += 1

    def __getitem__(self, i):
        keep = np.arange(self.crop_to)  # deterministic crop: first points
        return {
            "positions": self.full_pts[keep],
            "features": np.ones((self.crop_to, 1), np.float32),
            "labels": np.zeros((self.crop_to,), np.int32),
            "valid_ids": keep.astype(np.int32),
        }


def test_segmentation_voter_accumulates_at_full_resolution():
    ds = _FakeDataset()
    trainer = _FakeTrainer(capacity=16, num_classes=4)
    voter = SegmentationVoter(trainer, ds, num_classes=4, capacity=32)
    for epoch in range(3):
        voter.run_epoch(None, epoch)
    assert ds.epochs == 3
    acc = voter.accum[0]
    assert acc.shape == (40, 4)
    # Voted points: out_idx = 0,2,4,... of the crop -> original ids 0..30.
    seen = acc.sum(-1) != 0
    assert seen[: 32 : 2].all() and not seen[32:].any()
    # Votes match the fake predictor's rule and accumulate over epochs.
    voted = acc.argmax(-1)
    expect = np.floor(ds.full_pts[:32:2, 0]).astype(int) % 4
    np.testing.assert_array_equal(voted[:32:2], expect)
    assert acc.max() == 30.0  # 10.0 logit x 3 epochs
    # Metrics path runs with the ground-truth rule -> perfect IoU.
    full_labels = [np.floor(ds.full_pts[:, 0]).astype(int) % 4]
    summary = voter.metrics(full_labels)
    assert summary["miou"] == 1.0


class _FakeClassTrainer:
    def eval_step(self, state, batch, rng):
        b = batch["positions"].shape[0]
        logits = np.zeros((b, 3))
        logits[:, 1] = float(state)  # 'checkpoint' votes for class 1
        return {"logits": jnp.asarray(logits)}


class _FakeClassDataset:
    def __len__(self):
        return 5

    def increase_epoch_counter(self):
        pass

    def __getitem__(self, i):
        return {
            "positions": np.zeros((8, 3), np.float32),
            "features": np.zeros((8, 1), np.float32),
            "label": np.int32(1),
        }


def test_classification_voter_ensembles():
    voter = ClassificationVoter(
        _FakeClassTrainer(), _FakeClassDataset(), num_classes=3, capacity=8,
        batch_size=2,
    )
    voter.run_epoch([2.0, 3.0], epoch=0)  # two 'checkpoints'
    assert voter.accuracy() == 1.0
    np.testing.assert_allclose(voter.accum[:, 1], 5.0)


def test_classification_voter_class_accuracy_balances_classes():
    """Class Acc = mean over per-class accuracies, classes present only
    (reference test_rot.py:284-291)."""
    voter = ClassificationVoter(
        _FakeClassTrainer(), _FakeClassDataset(), num_classes=4, capacity=8,
        batch_size=2,
    )
    # 3 samples of class 0 (2 right), 1 sample of class 1 (right);
    # classes 2/3 absent from the eval set.
    voter.labels = np.array([0, 0, 0, 1])
    voter.accum = np.zeros((4, 4))
    voter.accum[[0, 1, 3], [0, 0, 1]] = 1.0  # predictions 0,0,?,1
    voter.accum[2, 1] = 1.0  # third class-0 sample predicted as 1
    per = voter.per_class_accuracy()
    np.testing.assert_allclose(per, [2 / 3, 1.0])
    assert abs(voter.class_accuracy() - (2 / 3 + 1.0) / 2) < 1e-12
    assert abs(voter.accuracy() - 3 / 4) < 1e-12


def test_segmentation_voter_checkpoint_ensemble():
    """A list of states accumulates each member's logits (reference
    multi-checkpoint ensembling, test_rot.py:111-156)."""
    ds = _FakeDataset()
    trainer = _FakeTrainer(capacity=16, num_classes=4)
    voter = SegmentationVoter(trainer, ds, num_classes=4, capacity=32)
    voter.run_epoch([None, None, None], 0)  # 3-member ensemble, one epoch
    acc = voter.accum[0]
    assert acc.max() == 30.0  # 10.0 logit x 3 ensemble members


# --- full-scene inference at arbitrary size (real model) --------------------


def _tiny_seg_trainer(eval_capacity=None):
    import dataclasses

    from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig
    from se3conv3d_tpu.models import FPNSegUNet, get_model_spec
    from se3conv3d_tpu.train import Trainer, TrainSettings, make_optimizer

    hcfg = HierarchyConfig(
        init_cell_size=0.08,
        cell_sizes=(0.16, 0.32),
        capacities=(128, 64, 32),
        out_cell_size=0.1,
        out_capacity=128,
        frames=FrameConfig(n_frames=2, neigh_k=8),
    )
    spec = dataclasses.replace(
        get_model_spec("FPNSegUNetMLPGeluRotEqFAUST"),
        patch_num_levels=1,
        patch_num_features=(8,),
        num_blocks=(1, 1),
        num_features=(8, 16),
        fpn_dec_feats=8,
        max_neighbors=8,
    )
    model = FPNSegUNet(spec, num_in_feats=3, num_classes=5)
    tx = make_optimizer(max_lr=5e-3, total_steps=10)
    settings = TrainSettings(label_smoothing=0.0)

    def factory(cap):
        return Trainer(
            model, hcfg, tx, settings,
            eval_hierarchy_config=hcfg.with_capacity(cap),
        )

    trainer = (
        Trainer(model, hcfg, tx, settings)
        if eval_capacity is None
        else factory(eval_capacity)
    )
    batch = {
        "positions": jax.random.uniform(jax.random.PRNGKey(0), (1, 128, 3)),
        "mask": jnp.ones((1, 128), bool),
        "features": jnp.ones((1, 128, 3)),
        "labels": jax.random.randint(jax.random.PRNGKey(1), (1, 128), 0, 5),
    }
    state = trainer.init(jax.random.PRNGKey(2), batch)
    state = trainer.calibration_step(state, batch, jax.random.PRNGKey(3))
    return trainer, factory, state


class _OneSceneDataset:
    """One labeled scene of ``n`` points (over trainer capacity)."""

    def __init__(self, n):
        rng = np.random.default_rng(7)
        self.pts = rng.uniform(0, 1.5, (n, 3)).astype(np.float32)
        self.labels = rng.integers(0, 5, n).astype(np.int32)

    def __len__(self):
        return 1

    def get_num_pts(self, i):
        return len(self.pts)

    def increase_epoch_counter(self):
        pass

    def __getitem__(self, i):
        return {
            "positions": self.pts,
            "features": np.ones((len(self.pts), 3), np.float32),
            "labels": self.labels,
        }


def test_oversize_scene_bucketed_matches_one_shot_big_capacity():
    """VERDICT r2 #4 'done' criterion: a scene over the evaluator capacity
    runs through an auto-bucketed trainer and yields logits identical to a
    voter built directly at the big capacity."""
    from se3conv3d_tpu.train.evaluate import SegmentationVoter

    n_scene = 300  # > out_capacity 128; bucket of 384 covers it
    ds = _OneSceneDataset(n_scene)
    trainer, factory, state = _tiny_seg_trainer()

    voter_a = SegmentationVoter(
        trainer, ds, num_classes=5, capacity=128,
        trainer_factory=factory, bucket=384,
    )
    voter_a.run_epoch(state, 0)
    acc_a = voter_a.accum[0]
    assert acc_a.shape == (n_scene, 5)
    assert (acc_a.sum(-1) != 0).any()

    big_trainer, _, state_b = _tiny_seg_trainer(eval_capacity=384)
    voter_b = SegmentationVoter(big_trainer, ds, num_classes=5, capacity=384)
    voter_b.run_epoch(state, 0)  # same state, same rng key per (epoch, i)
    np.testing.assert_allclose(acc_a, voter_b.accum[0], atol=1e-5)

    summary_a = voter_a.metrics([ds.labels])
    summary_b = voter_b.metrics([ds.labels])
    assert summary_a["miou"] == summary_b["miou"]
    assert summary_a["overall_acc"] == summary_b["overall_acc"]


def test_prediction_only_eval_without_labels():
    """Batches without a labels key (unlabeled benchmark split) evaluate
    prediction-only: logits come back, no loss/labels in the output
    (reference ``test_scannet_rot.py:396-465``)."""
    trainer, _, state = _tiny_seg_trainer()
    batch = {
        "positions": jax.random.uniform(jax.random.PRNGKey(5), (1, 128, 3)),
        "mask": jnp.ones((1, 128), bool),
        "features": jnp.ones((1, 128, 3)),
    }
    out = trainer.eval_step(state, batch, jax.random.PRNGKey(6))
    assert "logits" in out and "mask" in out
    assert "loss" not in out and "labels" not in out
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_pad_collate_oversize_raises():
    from se3conv3d_tpu.data.loaders import pad_collate

    sample = {"positions": np.zeros((100, 3), np.float32)}
    try:
        pad_collate([sample], capacity=64)
    except ValueError as e:
        assert "exceeds" in str(e)
    else:
        raise AssertionError("expected ValueError for over-capacity sample")


def test_metrics_update_np_matches_device_update():
    """The voters' host-side numpy accumulation must produce the same
    counts as the jitted device update (incl. out-of-range labels, which
    one_hot drops)."""
    from se3conv3d_tpu.train.metrics import SemSegMetrics

    rng = np.random.default_rng(3)
    c = 5
    pred = rng.integers(0, c, 200)
    labels = rng.integers(-1, c + 1, 200)  # includes -1 and c (invalid)
    mask = rng.random(200) > 0.3

    dev = SemSegMetrics.empty(c).update(
        jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(mask)
    )
    host = SemSegMetrics.empty(c).update_np(pred, labels, mask)
    for f in ("intersection", "union", "gt_count", "pred_count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(dev, f)), np.asarray(getattr(host, f)), f
        )
    s_dev, s_host = dev.summary(), host.summary()
    assert s_dev["miou"] == s_host["miou"]


class _BatchAwareTrainer:
    """Batch-generalised _FakeTrainer: handles V scene copies per step."""

    def __init__(self, capacity, num_classes, subsample=2):
        self.capacity = capacity
        self.num_classes = num_classes
        self.subsample = subsample

    def eval_step(self, state, batch, rng):
        b = batch["positions"].shape[0]
        logits, masks, idxs = [], [], []
        for j in range(b):
            pos = batch["positions"][j]
            n = pos.shape[0]
            out_idx = np.clip(np.arange(self.capacity) * self.subsample, 0, n - 1)
            mask = np.arange(self.capacity) < (
                int(batch["mask"][j].sum()) // self.subsample
            )
            lab = np.floor(pos[out_idx, 0]).astype(int) % self.num_classes
            logits.append(np.eye(self.num_classes)[lab] * 10.0)
            masks.append(mask)
            idxs.append(out_idx)
        return {
            "logits": jnp.asarray(np.stack(logits)),
            "mask": jnp.asarray(np.stack(masks)),
            "out_idx": jnp.asarray(np.stack(idxs)),
            "labels": jnp.zeros((b, self.capacity), jnp.int32),
            "loss": jnp.zeros(()),
        }


def test_vote_batching_matches_sequential_votes():
    """votes_per_step=V accumulates V votes per run_epoch call and, with a
    deterministic dataset/trainer, exactly equals V sequential epochs."""
    ds_a, ds_b = _FakeDataset(), _FakeDataset()
    seq = SegmentationVoter(
        _BatchAwareTrainer(capacity=16, num_classes=4), ds_a,
        num_classes=4, capacity=32,
    )
    for epoch in range(4):
        seq.run_epoch(None, epoch)
    batched = SegmentationVoter(
        _BatchAwareTrainer(capacity=16, num_classes=4), ds_b,
        num_classes=4, capacity=32, votes_per_step=4,
    )
    batched.run_epoch(None, 0)
    np.testing.assert_allclose(batched.accum[0], seq.accum[0])
