"""Test-time evaluation with logit voting and segment smoothing.

Counterpart of the reference evaluation CLIs (SURVEY §3.3):

  * ``test_dfaust_rot.py:293-315`` / ``test_scannet_rot.py:294-312`` —
    accumulate per-scene logits at full resolution over ``vote_epochs``
    passes, re-drawing augmentations (via the aug pipelines' epoch
    counters) and reference frames each pass;
  * ``test_scannet_rot.py:314-329`` — segment smoothing: mean the
    accumulated logits over ScanNet segment ids and broadcast back;
  * ``test_rot.py:111-156`` — classification voting over epochs and a
    checkpoint ensemble.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np

from ..data.loaders import pad_collate
from ..parallel.multihost import cross_host_sum
from .metrics import SemSegMetrics

__all__ = ["SegmentationVoter", "ClassificationVoter", "segment_smooth"]


def segment_smooth(logits: np.ndarray, segments: np.ndarray) -> np.ndarray:
    """Mean logits per segment id, broadcast back to points
    (reference ``test_scannet_rot.py:314-329``)."""
    n_seg = int(segments.max()) + 1
    sums = np.zeros((n_seg, logits.shape[-1]), logits.dtype)
    np.add.at(sums, segments, logits)
    counts = np.bincount(segments, minlength=n_seg)[:, None]
    return (sums / np.maximum(counts, 1))[segments]


class SegmentationVoter:
    """Full-resolution logit voting over re-drawn augs/frames.

    Args:
      trainer: a ``Trainer`` (its eval step returns out_idx when the config
        subsamples the output cloud).
      dataset: segmentation dataset; scenes expose full-resolution labels
        (and optionally segments) with augmentations re-drawn per epoch.
      capacity: static pad capacity for single-scene batches.
    """

    def __init__(self, trainer, dataset, num_classes: int, capacity: int,
                 trainer_factory=None, bucket: int = 16384,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 votes_per_step: int = 1):
        self.trainer = trainer
        self.dataset = dataset
        self.num_classes = num_classes
        self.capacity = capacity
        self.accum: List[Optional[np.ndarray]] = [None] * len(dataset)
        # Multi-host: each process votes on its strided slice of the
        # scenes and metrics() sums the per-class accumulators across
        # processes — the union covers every scene exactly once.
        # Single-process (the default) evaluates everything, unchanged.
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        # In-graph vote batching: one eval step carries V copies of the
        # scene on the batch axis — frame re-draws are per-point random
        # inside build_hierarchy (attach_frames draws [B, N, ...] scores),
        # so the V rows are V independent vote draws, and host augs are
        # re-drawn per copy by the V dataset[i] calls.  One run_epoch call
        # then scores V votes; callers loop ceil(votes / V) times.  Note
        # epoch-SCHEDULED augmentations (epoch_iter lists) advance once
        # per run_epoch call, i.e. per V-group — keep votes_per_step=1
        # for protocols whose TTA schedule must advance every vote
        # (random-draw TTA like RotationAug3D / fresh PCA frames is
        # unaffected).  Measured on chip: see PARITY.md voting section.
        self.votes_per_step = max(int(votes_per_step), 1)
        # capacity (int) -> Trainer whose eval step runs at that capacity;
        # lets over-capacity scenes (real ScanNet scenes reach ~1.5M pts,
        # reference feeds them whole at batch 1) evaluate one-shot at a
        # rounded-up capacity bucket instead of crashing in pad_collate.
        self.trainer_factory = trainer_factory
        self.bucket = bucket
        self._bucket_trainers = {}

    def _trainer_for(self, n_raw: int):
        if n_raw <= self.capacity:
            return self.trainer, self.capacity
        if self.trainer_factory is None:
            raise ValueError(
                f"scene with {n_raw} points exceeds the evaluator capacity "
                f"{self.capacity} and no trainer_factory was provided"
            )
        cap = ((n_raw + self.bucket - 1) // self.bucket) * self.bucket
        if cap not in self._bucket_trainers:
            self._bucket_trainers[cap] = self.trainer_factory(cap)
        return self._bucket_trainers[cap], cap

    def run_epoch(self, state, epoch: int):
        """``state``: a TrainState or a list of them — each member of a
        checkpoint ensemble accumulates its logits into the same per-scene
        buffers (reference ``test_dfaust_rot.py:293-315`` /
        ``test_rot.py:111-156`` ensembling protocol)."""
        states = state if isinstance(state, (list, tuple)) else [state]
        self.dataset.increase_epoch_counter()
        v = self.votes_per_step
        for i in range(self.process_index, len(self.dataset), self.process_count):
            # V independent host-aug draws of the same scene = V votes
            samples = [self.dataset[i] for _ in range(v)]
            n_raws = [s["positions"].shape[0] for s in samples]
            keeps = [
                {
                    k: val
                    for k, val in s.items()
                    if k in ("positions", "features", "labels")
                }
                for s in samples
            ]
            trainer, cap = self._trainer_for(max(n_raws))
            batch = pad_collate(keeps, capacity=cap)
            full_n = (
                self.dataset.get_num_pts(i)
                if hasattr(self.dataset, "get_num_pts")
                else n_raws[0]
            )
            if self.accum[i] is None:
                self.accum[i] = np.zeros(
                    (full_n, self.num_classes), np.float64
                )
            for state_j in states:
                out = trainer.eval_step(
                    state_j, batch, jax.random.PRNGKey(epoch * 100003 + i)
                )
                logits_v = np.asarray(jax.device_get(out["logits"]))
                mask_v = np.asarray(jax.device_get(out["mask"]))
                idx_v = (
                    np.asarray(jax.device_get(out["out_idx"]))
                    if "out_idx" in out
                    else np.broadcast_to(np.arange(cap), (v, cap))
                )
                for j in range(v):
                    rows = np.nonzero(mask_v[j])[0]
                    idx_m = idx_v[j][rows]
                    ok = idx_m < n_raws[j]
                    orig = idx_m[ok]
                    valid_ids = samples[j].get("valid_ids")
                    if valid_ids is not None:
                        orig = valid_ids[orig]
                    np.add.at(self.accum[i], orig, logits_v[j][rows[ok]])

    def metrics(
        self,
        full_labels: Sequence[np.ndarray],
        segments: Optional[Sequence[np.ndarray]] = None,
        class_mask=None,
        smooth: bool = False,
    ):
        m = SemSegMetrics.empty(self.num_classes)
        for i, labels in enumerate(full_labels):
            logits = self.accum[i]
            if logits is None or labels is None:
                continue
            if smooth and segments is not None:
                logits = segment_smooth(logits, segments[i])
            voted = logits.argmax(-1)
            seen = logits.sum(-1) != 0
            # host-side accumulation: the logits/labels already live on
            # host, and eager per-scene jnp ops would round-trip the
            # tunnel-attached device (update_np docstring)
            m = m.update_np(voted, labels, seen)
        # per-host scene slices -> global per-class sums (no-op with one
        # process; each scene is voted by exactly one host)
        m = cross_host_sum(jax.tree_util.tree_map(np.asarray, m))
        return m.summary(class_mask)


class ClassificationVoter:
    """Logit voting over epochs x checkpoint ensemble
    (reference ``test_rot.py:111-156``)."""

    def __init__(self, trainer, dataset, num_classes: int, capacity: int,
                 batch_size: int = 8,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.trainer = trainer
        self.dataset = dataset
        self.num_classes = num_classes
        self.capacity = capacity
        self.batch_size = batch_size
        self.accum = np.zeros((len(dataset), num_classes), np.float64)
        self.labels = np.zeros((len(dataset),), np.int64)
        # Multi-host: strided scene slice per process (see
        # SegmentationVoter); accessors sum across processes.
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )

    def run_epoch(self, states, epoch: int):
        """``states``: list of TrainStates (checkpoint ensemble)."""
        self.dataset.increase_epoch_counter()
        mine = list(range(self.process_index, len(self.dataset), self.process_count))
        for start in range(0, len(mine), self.batch_size):
            idx = mine[start : start + self.batch_size]
            samples = [self.dataset[i] for i in idx]
            # pad the trailing partial batch to the fixed batch size so
            # the jitted eval step never recompiles (padded rows are
            # dropped below because only `idx` positions accumulate)
            while len(samples) < self.batch_size:
                samples.append(samples[-1])
            batch = pad_collate(
                [
                    {"positions": s["positions"], "features": s["features"],
                     "labels": s["label"]}
                    for s in samples
                ],
                capacity=self.capacity,
            )
            for state in states:
                out = self.trainer.eval_step(
                    state, batch, jax.random.PRNGKey(epoch * 99991 + start)
                )
                logits = np.asarray(jax.device_get(out["logits"]))
                self.accum[idx] += logits[: len(idx)]
            self.labels[idx] = [int(s["label"]) for s in samples[: len(idx)]]

    def _global(self):
        """Cross-process (accum, labels): each scene is voted by exactly
        one process and the others hold zeros, so a plain sum assembles
        the global buffers (no-op single-process)."""
        return cross_host_sum((self.accum, self.labels))

    def accuracy(self) -> float:
        accum, labels = self._global()
        return float((accum.argmax(-1) == labels).mean())

    def class_accuracy(self) -> float:
        """Class-balanced accuracy: mean over per-class accuracies of the
        classes present (reference ``test_rot.py:284-291``)."""
        return float(np.mean(self.per_class_accuracy()))

    def per_class_accuracy(self) -> np.ndarray:
        accum, labels = self._global()
        equal = accum.argmax(-1) == labels
        return np.array([
            equal[labels == c].mean()
            for c in range(self.num_classes)
            if (labels == c).any()
        ])
