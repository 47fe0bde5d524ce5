"""Semantic-segmentation / classification metrics.

Counterpart of reference ``metrics/SemSegMetrics.py:3-68``: accumulate
per-class intersection / union / ground-truth counts and report per-class
and mean IoU / accuracy with an optional class mask (ScanNet's ignored
classes).  The accumulator is a jax pytree so updates run on-device inside
the jitted eval step; ``summary()`` pulls to host.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["SemSegMetrics", "accuracy", "dataset_class_mask"]


def dataset_class_mask(ds, num_classes: int) -> Optional[np.ndarray]:
    """Metric class mask from a dataset's declared ``mask_classes``.

    ScanNet declares classes excluded from mIoU/mAcc averaging (class 0
    plus, for scannet200 val/test, the 11 train-only classes — reference
    ``ScanNet.py:230-237``); datasets without ``mask_classes`` (DFaust,
    ModelNet) score every class.
    """
    mask_classes = getattr(ds, "mask_classes", None)
    if not mask_classes:
        return None
    class_mask = np.ones(num_classes, bool)
    for c in mask_classes:
        class_mask[c] = False
    return class_mask


class SemSegMetrics(struct.PyTreeNode):
    intersection: jnp.ndarray  # [C]
    union: jnp.ndarray  # [C]
    gt_count: jnp.ndarray  # [C]
    pred_count: jnp.ndarray  # [C]

    @classmethod
    def empty(cls, num_classes: int) -> "SemSegMetrics":
        z = jnp.zeros((num_classes,), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)
        return cls(intersection=z, union=z, gt_count=z, pred_count=z)

    @property
    def num_classes(self) -> int:
        return self.intersection.shape[0]

    def update(
        self,
        pred: jnp.ndarray,
        labels: jnp.ndarray,
        mask: jnp.ndarray,
    ) -> "SemSegMetrics":
        """Accumulate from predicted class ids (any shape, with a matching
        boolean mask)."""
        c = self.num_classes
        pred = pred.reshape(-1)
        labels = labels.reshape(-1)
        m = mask.reshape(-1)
        safe_pred = jnp.where(m, pred, c)
        safe_gt = jnp.where(m, labels, c)
        onehot_pred = jax.nn.one_hot(safe_pred, c, dtype=self.intersection.dtype)
        onehot_gt = jax.nn.one_hot(safe_gt, c, dtype=self.intersection.dtype)
        inter = jnp.sum(onehot_pred * onehot_gt, axis=0)
        pred_cnt = jnp.sum(onehot_pred, axis=0)
        gt_cnt = jnp.sum(onehot_gt, axis=0)
        return self.replace(
            intersection=self.intersection + inter,
            union=self.union + pred_cnt + gt_cnt - inter,
            gt_count=self.gt_count + gt_cnt,
            pred_count=self.pred_count + pred_cnt,
        )

    def update_np(self, pred, labels, mask) -> "SemSegMetrics":
        """Host-side numpy accumulation (same counts as ``update``).

        The voting evaluators accumulate per scene from HOST-resident
        logits; the jitted ``update`` would run its one_hot ops eagerly
        there — one device round-trip per op with ``[N, C]`` integer
        intermediates (~1 GB for a 1.5M-pt scannet200 scene).  bincount
        on host does the same counting.  Out-of-range labels contribute
        nothing (mirrors one_hot's zero rows for invalid ids)."""
        c = self.num_classes
        pred = np.asarray(pred).reshape(-1)
        labels = np.asarray(labels).reshape(-1)
        m = np.asarray(mask).reshape(-1).astype(bool)
        pred, labels = pred[m], labels[m]
        dt = np.asarray(self.intersection).dtype
        pred_cnt = np.bincount(pred, minlength=c)[:c].astype(dt)
        lab_ok = (labels >= 0) & (labels < c)
        gt_cnt = np.bincount(labels[lab_ok], minlength=c)[:c].astype(dt)
        inter = np.bincount(
            labels[lab_ok & (pred == labels)], minlength=c
        )[:c].astype(dt)
        return self.replace(
            intersection=np.asarray(self.intersection) + inter,
            union=np.asarray(self.union) + pred_cnt + gt_cnt - inter,
            gt_count=np.asarray(self.gt_count) + gt_cnt,
            pred_count=np.asarray(self.pred_count) + pred_cnt,
        )

    def summary(self, class_mask: Optional[Sequence[bool]] = None) -> dict:
        """Host-side per-class + mean IoU / accuracy.

        ``class_mask`` selects the classes included in the means (reference
        masks ignored ScanNet classes out of the averages)."""
        inter = np.asarray(self.intersection, np.float64)
        union = np.asarray(self.union, np.float64)
        gt = np.asarray(self.gt_count, np.float64)
        iou = inter / np.maximum(union, 1.0)
        acc = inter / np.maximum(gt, 1.0)
        sel = (
            np.ones_like(iou, bool)
            if class_mask is None
            else np.asarray(class_mask, bool)
        )
        return {
            "iou_per_class": iou,
            "acc_per_class": acc,
            "miou": float(iou[sel].mean()) if sel.any() else 0.0,
            "macc": float(acc[sel].mean()) if sel.any() else 0.0,
            "overall_acc": float(inter.sum() / max(gt.sum(), 1.0)),
        }


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Classification top-1 accuracy (``[B, C]`` logits)."""
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
