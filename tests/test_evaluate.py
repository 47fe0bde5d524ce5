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


def test_segmentation_voter_checkpoint_ensemble():
    """A list of states accumulates each member's logits (reference
    multi-checkpoint ensembling, test_rot.py:111-156)."""
    ds = _FakeDataset()
    trainer = _FakeTrainer(capacity=16, num_classes=4)
    voter = SegmentationVoter(trainer, ds, num_classes=4, capacity=32)
    voter.run_epoch([None, None, None], 0)  # 3-member ensemble, one epoch
    acc = voter.accum[0]
    assert acc.max() == 30.0  # 10.0 logit x 3 ensemble members
