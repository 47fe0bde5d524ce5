"""Cross-host metric reduction + non-batch-axis host_local (VERDICT r4 #6).

Single-process stand-ins for the multi-host protocol: the voters shard
scenes by (process_index, process_count) and their metric accumulators
sum across processes; here two voter instances play the two hosts and
the union/sum must equal the unsharded voter exactly.  The 2-D-mesh
``host_local`` case re-shards to batch-only instead of raising.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from test_evaluate import _FakeTrainer  # noqa: E402

from se3conv3d_tpu.parallel.mesh import make_mesh, shard_batch
from se3conv3d_tpu.parallel.multihost import (
    _combine_local_shards,
    cross_host_sum,
    host_local,
)
from se3conv3d_tpu.train.evaluate import ClassificationVoter, SegmentationVoter


def test_cross_host_sum_single_process_noop():
    tree = {"a": np.arange(5), "b": (np.ones(3), np.float64(2.5))}
    out = cross_host_sum(tree)
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"][0], tree["b"][0])


def test_host_local_2d_mesh_reshards_instead_of_raising():
    mesh = make_mesh(8, points=2)  # (data=4, points=2)
    x = np.arange(8 * 16 * 3, dtype=np.float32).reshape(8, 16, 3)
    batch = shard_batch(mesh, {"positions": x})
    arr = batch["positions"]
    # single-process arrays are fully addressable, so host_local's fast
    # path applies; the shard-combining logic (the multi-host path) is
    # exercised directly and must reassemble the full batch after the
    # implicit points-axis gather.
    np.testing.assert_array_equal(_combine_local_shards(arr), x)
    np.testing.assert_array_equal(host_local(arr), x)


class _ManySceneDataset:
    """N scenes; scene i = 24 points at x ~ i (predicted class i % C)."""

    def __init__(self, n_scenes=5, n_pts=24):
        rng = np.random.default_rng(1)
        self.scenes = [
            (i % 4) + rng.uniform(0, 0.5, (n_pts, 3)).astype(np.float32)
            for i in range(n_scenes)
        ]
        self.epochs = 0

    def __len__(self):
        return len(self.scenes)

    def get_num_pts(self, i):
        return len(self.scenes[i])

    def increase_epoch_counter(self):
        self.epochs += 1

    def __getitem__(self, i):
        pts = self.scenes[i]
        return {
            "positions": pts,
            "features": np.ones((len(pts), 1), np.float32),
            "labels": np.zeros((len(pts),), np.int32),
        }


def test_segmentation_voter_shards_scenes_and_sums_globally():
    ds = _ManySceneDataset()
    kw = dict(num_classes=4, capacity=24)
    full = SegmentationVoter(
        _FakeTrainer(capacity=12, num_classes=4), ds, **kw,
        process_index=0, process_count=1,
    )
    host0 = SegmentationVoter(
        _FakeTrainer(capacity=12, num_classes=4), ds, **kw,
        process_index=0, process_count=2,
    )
    host1 = SegmentationVoter(
        _FakeTrainer(capacity=12, num_classes=4), ds, **kw,
        process_index=1, process_count=2,
    )
    for v in (full, host0, host1):
        v.run_epoch(None, 0)

    # union: each scene voted by exactly one host, no overlap
    for i in range(len(ds)):
        a, b = host0.accum[i], host1.accum[i]
        assert (a is None) != (b is None)
        got = a if a is not None else b
        np.testing.assert_array_equal(got, full.accum[i])

    # global metrics: sum of the two hosts' accumulators == unsharded
    labels = [
        np.floor(ds.scenes[i][:, 0]).astype(int) % 4 for i in range(len(ds))
    ]
    merged = SegmentationVoter(
        _FakeTrainer(capacity=12, num_classes=4), ds, **kw,
        process_index=0, process_count=1,
    )
    merged.accum = [
        (host0.accum[i] if host0.accum[i] is not None else 0)
        + (host1.accum[i] if host1.accum[i] is not None else 0)
        for i in range(len(ds))
    ]
    got, want = merged.metrics(labels), full.metrics(labels)
    assert got["miou"] == want["miou"]
    assert got["macc"] == want["macc"]
    np.testing.assert_array_equal(got["iou_per_class"], want["iou_per_class"])


class _BiasedClassTrainer:
    """Votes class = scene's x-offset (recovered from positions)."""

    def eval_step(self, state, batch, rng):
        b = batch["positions"].shape[0]
        cls = np.floor(np.asarray(batch["positions"])[:, 0, 0]).astype(int) % 4
        logits = np.eye(4)[cls] * 5.0
        return {"logits": jnp.asarray(logits)}


def test_classification_voter_shards_and_sums():
    labels = [i % 4 for i in range(5)]

    class _DS(_ManySceneDataset):
        def __getitem__(self, i):
            out = _ManySceneDataset.__getitem__(self, i)
            return {
                "positions": out["positions"],
                "features": out["features"],
                "label": labels[i],
            }

    ds = _DS()
    kw = dict(num_classes=4, capacity=24, batch_size=2)
    full = ClassificationVoter(
        _BiasedClassTrainer(), ds, **kw, process_index=0, process_count=1
    )
    host0 = ClassificationVoter(
        _BiasedClassTrainer(), ds, **kw, process_index=0, process_count=2
    )
    host1 = ClassificationVoter(
        _BiasedClassTrainer(), ds, **kw, process_index=1, process_count=2
    )
    for v in (full, host0, host1):
        v.run_epoch([None], 0)

    np.testing.assert_array_equal(host0.accum + host1.accum, full.accum)
    np.testing.assert_array_equal(host0.labels + host1.labels, full.labels)
    # accuracy over the manually merged buffers == unsharded accuracy
    merged = ClassificationVoter(
        _BiasedClassTrainer(), ds, **kw, process_index=0, process_count=1
    )
    merged.accum = host0.accum + host1.accum
    merged.labels = host0.labels + host1.labels
    assert merged.accuracy() == full.accuracy() == 1.0
