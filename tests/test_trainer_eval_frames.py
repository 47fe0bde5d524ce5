"""Eval steps use the test-time frame config (train/test n_frames split)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from se3conv3d_tpu.core.hierarchy import FrameConfig, HierarchyConfig
from se3conv3d_tpu.models import FPNSegUNet, get_model_spec
from se3conv3d_tpu.train import Trainer, TrainSettings, make_optimizer


@pytest.mark.slow
def test_eval_uses_test_n_frames():
    train_cfg = HierarchyConfig(
        init_cell_size=0.08, cell_sizes=(0.16, 0.32),
        capacities=(96, 48, 24), out_cell_size=0.1, out_capacity=96,
        frames=FrameConfig(n_frames=1, neigh_k=8),
    )
    eval_cfg = dataclasses.replace(
        train_cfg, frames=train_cfg.frames.with_n_frames(2)
    )
    spec = dataclasses.replace(
        get_model_spec("FPNSegUNetMLPGeluRotEqFAUST"),
        patch_num_levels=1, patch_num_features=(8,),
        num_blocks=(1, 1), num_features=(8, 16),
        fpn_dec_feats=8, max_neighbors=8,
    )
    model = FPNSegUNet(spec, num_in_feats=3, num_classes=5)
    trainer = Trainer(
        model, train_cfg, make_optimizer(1e-3, 10),
        TrainSettings(), eval_hierarchy_config=eval_cfg,
    )
    b, n = 1, 96
    batch = {
        "positions": jax.random.uniform(jax.random.PRNGKey(0), (b, n, 3)),
        "mask": jnp.ones((b, n), bool),
        "features": jnp.ones((b, n, 3)),
        "labels": jnp.zeros((b, n), jnp.int32),
    }
    state = trainer.init(jax.random.PRNGKey(1), batch)
    # Train step runs with 1 frame, eval with 2 — both must compile and
    # produce finite outputs against the same parameters.
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    out = trainer.eval_step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(out["loss"]))
    assert out["logits"].shape == (b, 96, 5)
