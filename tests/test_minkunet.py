"""Dense-voxel MinkUNet34A baseline: shapes, masking, and a train step.

Counterpart of the reference's optional MinkowskiEngine baseline
(``models/MinkUNet.py:440``); see the module docstring for the dense
approximation's semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from se3conv3d_tpu.models import MinkUNet34A
from se3conv3d_tpu.models.minkunet import devoxelize, voxelize

B, N, C, CLASSES = 2, 256, 3, 5
DIMS = (16, 8, 16)


def _batch(key):
    kp, kf = jax.random.split(key)
    pts = jax.random.uniform(kp, (B, N, 3)) * jnp.asarray([1.5, 0.7, 1.5])
    mask = jnp.ones((B, N), bool).at[:, N - 17:].set(False)
    feats = jax.random.normal(kf, (B, N, C))
    return pts, mask, feats


def test_voxelize_mean_and_slice_roundtrip():
    pts, mask, feats = _batch(jax.random.PRNGKey(0))
    grid, occ, flat = voxelize(pts, mask, feats, 0.1, DIMS)
    assert grid.shape == (B,) + DIMS + (C,)
    # points sharing a voxel read back the voxel MEAN of their features
    back = devoxelize(grid, flat)
    f0 = np.asarray(flat[0])
    feats0 = np.asarray(feats[0])
    m0 = np.asarray(mask[0])
    v = f0[m0][0]
    members = (f0 == v) & m0
    np.testing.assert_allclose(
        np.asarray(back[0])[members][0], feats0[members].mean(0), rtol=1e-5
    )
    # masked points scatter nothing
    grid2, _, _ = voxelize(pts, jnp.zeros_like(mask), feats, 0.1, DIMS)
    assert float(jnp.abs(grid2).sum()) == 0.0


@pytest.mark.slow
def test_forward_and_train_step():
    pts, mask, feats = _batch(jax.random.PRNGKey(1))
    labels = jax.random.randint(jax.random.PRNGKey(2), (B, N), 0, CLASSES)
    model = MinkUNet34A(num_classes=CLASSES, cell=0.1, grid_dims=DIMS)

    @jax.jit
    def init(pts, mask, feats):
        return model.init(jax.random.PRNGKey(3), pts, mask, feats, train=False)

    variables = init(pts, mask, feats)
    params = variables["params"]
    stats = variables["batch_stats"]

    @jax.jit
    def loss_fn(params, stats):
        logits, updates = model.apply(
            {"params": params, "batch_stats": stats},
            pts, mask, feats, train=True, mutable=["batch_stats"],
        )
        assert logits.shape == (B, N, CLASSES)
        ls = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return jnp.sum(ls * mask) / jnp.sum(mask), updates["batch_stats"]

    (l0, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
    assert np.isfinite(float(l0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    up, opt_state = tx.update(grads, opt_state)
    params = optax.apply_updates(params, up)
    (l1, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
    assert np.isfinite(float(l1))
