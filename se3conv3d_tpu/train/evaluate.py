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
                 process_count: Optional[int] = None):
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
        for i in range(self.process_index, len(self.dataset), self.process_count):
            sample = self.dataset[i]
            n_raw = sample["positions"].shape[0]
            keep = {
                k: v
                for k, v in sample.items()
                if k in ("positions", "features", "labels")
            }
            trainer, cap = self._trainer_for(n_raw)
            batch = pad_collate([keep], capacity=cap)
            for state_j in states:
                out = trainer.eval_step(
                    state_j, batch, jax.random.PRNGKey(epoch * 100003 + i)
                )
                logits = np.asarray(jax.device_get(out["logits"]))[0]
                mask = np.asarray(jax.device_get(out["mask"]))[0]
                if "out_idx" in out:
                    idx = np.asarray(jax.device_get(out["out_idx"]))[0]
                else:
                    idx = np.arange(cap)
                valid_ids = sample.get("valid_ids")
                full_n = (
                    self.dataset.get_num_pts(i)
                    if hasattr(self.dataset, "get_num_pts")
                    else n_raw
                )
                if self.accum[i] is None:
                    self.accum[i] = np.zeros(
                        (full_n, self.num_classes), np.float64
                    )
                rows = np.nonzero(mask)[0]
                idx_m = idx[rows]
                ok = idx_m < n_raw
                orig = idx_m[ok]
                if valid_ids is not None:
                    orig = valid_ids[orig]
                np.add.at(self.accum[i], orig, logits[rows[ok]])

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
