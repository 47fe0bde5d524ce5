"""Multi-host data loading for data-parallel training.

The reference is single-process/single-GPU (SURVEY §2.6 — no
``torch.distributed`` anywhere), so this is a new TPU-native component,
not a port: on a multi-host slice each process sees only its local
devices, and a global batch must be assembled from per-host shards via
``jax.make_array_from_process_local_data``.

Design (no cross-host coordination beyond the shared seed):

  * every process runs the SAME seeded sampler and therefore computes
    the identical global batch list (``MaxPointsBatchSampler`` and the
    shuffled epoch loops in ``train/run.py`` are ``numpy.default_rng``
    driven — deterministic given the seed);
  * each process slices its own examples out of every global batch
    (:func:`process_slice`, round-robin so point-budget-packed batches
    split evenly by load);
  * each process pads its local example count to the globally agreed
    per-host count (:func:`pad_samples_to`) — all hosts compute the same
    target from the same global batch — and collates locally;
  * :func:`global_batch` builds the global sharded ``jax.Array``; with a
    single process it degrades to :func:`~.mesh.shard_batch` exactly.

Single-process CI can exercise everything except the true multi-host
assembly (``jax.make_array_from_process_local_data`` with
``process_count == 1`` is still the real code path and is tested on the
virtual CPU mesh).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import batch_sharding, shard_batch

__all__ = [
    "process_slice",
    "local_batch_size",
    "pad_samples_to",
    "global_batch",
    "host_local",
    "cross_host_sum",
]


def _combine_local_shards(arr) -> np.ndarray:
    """Concatenate this process's addressable shards in batch order.

    Arrays sharded over a NON-batch axis (the 2-D (data, points) mesh)
    are first re-sharded to batch-only via a compiled identity — an XLA
    all-gather over the point axis that every process participates in
    (SPMD), after which the batch-axis concatenation applies."""
    from jax.sharding import NamedSharding, PartitionSpec

    by_index = {}
    for s in arr.addressable_shards:
        key = tuple((sl.start, sl.stop, sl.step) for sl in s.index)
        by_index.setdefault(key, s)
    shards = list(by_index.values())
    if len(shards) == 1:
        return np.asarray(shards[0].data)
    if len({k[1:] for k in by_index}) > 1:
        # sharded over a non-batch axis: keep only the leading (batch)
        # partition and gather the rest
        spec = arr.sharding.spec
        batch_only = NamedSharding(
            arr.sharding.mesh,
            PartitionSpec(spec[0] if len(spec) else None),
        )
        arr = jax.jit(lambda x: x, out_shardings=batch_only)(arr)
        return _combine_local_shards(arr)
    shards.sort(key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def host_local(arr) -> np.ndarray:
    """Process-local numpy view of a (possibly multi-host-global) array.

    Fully-addressable arrays (single process, or replicated) round-trip
    through ``device_get``.  Multi-host batch-sharded arrays cannot be
    fetched whole (``device_get`` raises on non-addressable shards); this
    returns only THIS process's examples — its addressable shards
    concatenated in batch-index order (arrays sharded over a non-batch
    axis re-shard to batch-only first).  Because :func:`process_slice`
    partitions every global batch across hosts, each host evaluating its
    local view covers the full set exactly once in union; combine per-host
    metric accumulators with :func:`cross_host_sum` for global numbers."""
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        return _combine_local_shards(arr)
    return np.asarray(jax.device_get(arr))


def cross_host_sum(tree):
    """Sum a pytree of host-side numpy accumulators across processes.

    The cross-host metric reduction the evaluators need (each host
    accumulates over its :func:`process_slice` of the data): single
    process is an exact no-op; multi-process gathers via
    ``multihost_utils.process_allgather`` and sums the leading axis
    (dtype note: allgather routes through jax arrays, so int64/float64
    accumulators reduce at 32-bit precision unless x64 is enabled —
    immaterial for metric counts/logit sums).
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(tree)
    return jax.tree_util.tree_map(
        lambda g: np.asarray(g).sum(axis=0), gathered
    )


def process_slice(
    batch_indices: Sequence[int],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[int]:
    """This host's examples of one global batch (deterministic round-robin).

    Round-robin (``batch[i::count]``) rather than contiguous chunks: the
    point-budget sampler packs large scenes first, so striding balances
    points per host instead of giving host 0 all the big scenes.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(batch_indices[pi::pc])


def local_batch_size(
    global_batch_size: int, process_count: Optional[int] = None
) -> int:
    """Per-host example count every host must supply: ``ceil(B / P)``.

    Every host computes this from the same global batch, so all agree
    without communicating.
    """
    pc = jax.process_count() if process_count is None else process_count
    return -(-global_batch_size // pc)


def _empty_like_sample(sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """An all-masked 0-point filler sample shaped like ``sample``.

    ``pad_collate`` gives it an all-False mask row, so it contributes
    nothing to losses/metrics (mask-correct reductions everywhere).
    """
    n = sample["positions"].shape[0]
    out: Dict[str, np.ndarray] = {}
    for k, v in sample.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == n:
            out[k] = np.zeros((0,) + v.shape[1:], v.dtype)
        else:
            out[k] = np.zeros_like(np.asarray(v))
    return out


def pad_samples_to(
    samples: List[Dict[str, np.ndarray]],
    target: int,
    template: Optional[Dict[str, np.ndarray]] = None,
) -> List[Dict[str, np.ndarray]]:
    """Pad a local sample list to the agreed per-host count with empty
    (all-masked) samples; no-op when already there.

    ``template`` supplies the filler's key/shape structure when the local
    list is EMPTY — with many hosts, a host's round-robin slice of a
    small global batch (tail eval batches; point-budget batches that pack
    a single big scene) legitimately holds zero examples, and that host
    must still contribute ``target`` all-masked fillers to the global
    assembly.
    """
    if len(samples) > target:
        raise ValueError(
            f"{len(samples)} local samples exceed the agreed per-host "
            f"count {target}"
        )
    if not samples:
        if template is None:
            raise ValueError(
                "cannot pad an empty local sample list without a template"
            )
        return [_empty_like_sample(template) for _ in range(target)]
    filler = _empty_like_sample(samples[0])
    return samples + [filler] * (target - len(samples))


def global_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Assemble per-host padded batches into one globally sharded batch.

    With one process this is exactly ``shard_batch``; with several, each
    host contributes its local arrays and XLA addresses only the shards
    it owns.  The global batch axis is ``local_b * process_count``, so
    callers must have padded with :func:`pad_samples_to` first.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch, axis_name)
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree_util.tree_map(put, batch)
