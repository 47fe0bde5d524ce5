"""Multi-host input pipeline (parallel/multihost.py).

True multi-host assembly needs several processes; what single-process CI
pins down is (a) the deterministic slicing/padding logic every host runs
locally, (b) that the single-process path is bit-identical to the plain
sharded path, and (c) that all-masked filler examples are invisible to
the losses.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from se3conv3d_tpu.data.loaders import pad_collate
from se3conv3d_tpu.parallel.mesh import make_mesh, shard_batch
from se3conv3d_tpu.parallel.multihost import (
    global_batch,
    local_batch_size,
    pad_samples_to,
    process_slice,
)
from se3conv3d_tpu.train.losses import classification_loss


def _sample(n, seed):
    rng = np.random.default_rng(seed)
    return {
        "positions": rng.standard_normal((n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, n).astype(np.int64),
        "label": np.int64(seed % 7),
    }


def test_process_slice_partitions():
    ids = list(range(11))
    slices = [process_slice(ids, pi, 4) for pi in range(4)]
    assert sorted(sum(slices, [])) == ids
    flat = sum(slices, [])
    assert len(set(flat)) == len(flat)
    # round-robin: host 0 gets 0, 4, 8
    assert slices[0] == [0, 4, 8]


def test_local_batch_size_agreement():
    assert local_batch_size(8, 4) == 2
    assert local_batch_size(9, 4) == 3
    assert local_batch_size(3, 4) == 1
    # every host padding to the agreed count covers the global batch
    for b, pc in [(8, 4), (9, 4), (3, 4), (5, 2)]:
        per_host = [len(process_slice(range(b), pi, pc)) for pi in range(pc)]
        assert max(per_host) == local_batch_size(b, pc)


def test_pad_samples_fillers_are_masked():
    samples = [_sample(40, 0), _sample(25, 1)]
    padded = pad_samples_to(samples, 4)
    assert len(padded) == 4
    batch = pad_collate(padded, capacity=64)
    assert batch["positions"].shape == (4, 64, 3)
    assert batch["mask"][:2].sum() == 65
    assert not batch["mask"][2:].any()
    # scalar fields filled with zeros
    assert batch["label"][2] == 0

    with pytest.raises(ValueError):
        pad_samples_to(samples, 1)


def test_two_host_slices_cover_the_global_batch():
    ids = list(range(7))
    per_host = [process_slice(ids, pi, 2) for pi in range(2)]
    target = local_batch_size(len(ids), 2)
    collated = []
    for loc in per_host:
        samples = pad_samples_to([_sample(10 + i, i) for i in loc], target)
        collated.append(pad_collate(samples, capacity=32))
    # global example multiset = union of host shards (+ one filler)
    sizes = sorted(
        int(m.sum()) for c in collated for m in c["mask"]
    )
    assert sizes == sorted([0] + [10 + i for i in ids])


def test_global_batch_single_process_matches_shard_batch():
    mesh = make_mesh(4)
    batch = pad_collate([_sample(16, i) for i in range(4)], capacity=16)
    a = shard_batch(mesh, batch)
    b = global_batch(mesh, batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding


def test_classification_loss_ignores_fillers():
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 5)), jnp.float32
    )
    labels = jnp.asarray([1, 2, 0, 0])
    em = jnp.asarray([True, True, False, False])
    full = classification_loss(logits[:2], labels[:2])
    masked = classification_loss(logits, labels, example_mask=em)
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_pad_empty_slice_with_template():
    """A host whose round-robin slice of a small global batch is empty
    (e.g. one-scene point-budget batches with several hosts) still
    supplies `target` all-masked fillers shaped by the template."""
    template = _sample(40, 0)
    padded = pad_samples_to([], 2, template)
    assert len(padded) == 2
    batch = pad_collate(padded, capacity=64)
    assert batch["positions"].shape == (2, 64, 3)
    assert batch["mask"].sum() == 0  # pure filler: invisible to loss
    with pytest.raises(ValueError):
        pad_samples_to([], 2)  # no template -> explicit error
