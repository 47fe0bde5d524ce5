"""Losses for segmentation / classification training.

The reference trains everything with
``torch.nn.CrossEntropyLoss(label_smoothing=...)`` (e.g.
``tasks/SemSeg/train_dfaust_rot.py:530-557``); segmentation additionally
needs masking of padded output points and of ignored classes (ScanNet's
masked labels, reference ``loaders/ScanNet.py:230-237``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "softmax_cross_entropy",
    "masked_segmentation_loss",
    "masked_segmentation_loss_parts",
    "classification_loss",
    "classification_loss_parts",
]


def softmax_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """Per-element cross entropy with label smoothing (torch semantics:
    smoothed target = (1-s) * onehot + s / C)."""
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    target = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
    return -jnp.sum(target * log_probs, axis=-1)


def masked_segmentation_loss_parts(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    label_smoothing: float = 0.0,
    ignore_label: Optional[int] = None,
):
    """Unnormalised ``(total, count)`` of the masked cross entropy.

    The building block of :func:`masked_segmentation_loss`; exposed so
    gradient-accumulation paths (``Trainer`` scan-over-scenes) can weight
    per-scene contributions by their valid-point counts — summing parts
    across scenes reproduces the batched mean exactly.
    """
    valid = mask
    if ignore_label is not None:
        valid = valid & (labels != ignore_label)
    safe_labels = jnp.where(valid, labels, 0)
    ce = softmax_cross_entropy(logits, safe_labels, label_smoothing)
    total = jnp.sum(jnp.where(valid, ce, 0.0))
    count = jnp.sum(valid).astype(ce.dtype)
    return total, count


def masked_segmentation_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    label_smoothing: float = 0.0,
    ignore_label: Optional[int] = None,
) -> jnp.ndarray:
    """Mean cross entropy over valid (and non-ignored) output points.

    Args:
      logits: ``[B, M, C]``; labels: ``[B, M]``; mask: ``[B, M]``.
    """
    total, count = masked_segmentation_loss_parts(
        logits, labels, mask, label_smoothing, ignore_label
    )
    return total / jnp.maximum(count, 1.0)


def classification_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_smoothing: float = 0.0,
    example_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean cross entropy over the batch (``[B, C]`` logits).

    ``example_mask [B]`` excludes all-masked filler examples (multi-host
    batch padding, ``parallel/multihost.py``); without it this is a plain
    batch mean like the reference's ``CrossEntropyLoss``.
    """
    total, count = classification_loss_parts(
        logits, labels, label_smoothing, example_mask
    )
    return total / jnp.maximum(count, 1.0)


def classification_loss_parts(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_smoothing: float = 0.0,
    example_mask: Optional[jnp.ndarray] = None,
):
    """Unnormalised ``(total, count)`` of the batch cross entropy (the
    accumulation building block of :func:`classification_loss`)."""
    ce = softmax_cross_entropy(logits, labels, label_smoothing)
    if example_mask is None:
        return jnp.sum(ce), jnp.asarray(ce.shape[0], ce.dtype)
    total = jnp.sum(jnp.where(example_mask, ce, 0.0))
    return total, jnp.sum(example_mask).astype(ce.dtype)
