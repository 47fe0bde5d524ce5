"""End-to-end Experiment: config file -> datasets -> calibration ->
training epochs -> validation -> checkpoint -> resume (CPU, tiny shapes)."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_YAML = """
Training:
    log_folder: '{log}'
    num_epochs: 2
    batch_size: 2
    weight_decay: 0.0001
    max_lr: 0.005
    pct_start: 0.3
    clip_grads: 100.0
    label_smoothing: 0.2
    save_models_frequency: 1
    val_freq: 1

Dataset:
    dataset: 'dfaust'
    num_points: 96
    train_aug_file: 'configs.dfaust.DFaust_DS_Aug'
    test_aug_file: 'configs.dfaust.DFaust_DS_Aug_Val'

Model:
    model: FPNSegUNetMLPGeluRotEqFAUST
    max_drop_path: 0.2
    init_subsample: 0.1
    output_subsample: 0.12
    grid_subsamples: [0.2, 0.4]
    capacities: [96, 48, 24]
    out_capacity: 96
    max_neighbors: 8
    RefFrames:
        pca: True
        neigh_method: 'knn'
        neigh_kwargs:
            neigh_k: 8
        fixed_axis: False
        train_n_frames: 1
        test_n_frames: 1
"""


@pytest.fixture()
def dfaust_root(tmp_path):
    rng = np.random.default_rng(0)
    for split, n_models in [("train", 4), ("test", 2)]:
        d = tmp_path / split
        d.mkdir()
        for i in range(n_models):
            pts = rng.standard_normal((96, 3)).astype(np.float32) * 0.3
            labels = rng.integers(0, 22, 96).astype(np.int64)
            torch.save(torch.from_numpy(pts), d / f"model_{i}_pc.pt")
            torch.save(torch.from_numpy(labels), d / f"model_{i}_labels.pt")
    return tmp_path


@pytest.mark.slow
def test_experiment_end_to_end_with_resume(dfaust_root, tmp_path):
    from se3conv3d_tpu.train.run import Experiment

    log = tmp_path / "logs"
    conf = tmp_path / "conf.yaml"
    conf.write_text(_YAML.format(log=log))

    exp = Experiment(str(conf), str(dfaust_root))
    # Shrink the model for test speed.
    import dataclasses

    from se3conv3d_tpu.models import FPNSegUNet, get_model_spec

    spec = dataclasses.replace(
        exp.model.spec, patch_num_levels=1, patch_num_features=(8,),
        num_blocks=(1, 1), num_features=(8, 16), fpn_dec_feats=8,
    )
    exp.model = FPNSegUNet(spec, exp.num_in_feats, exp.num_classes)
    from se3conv3d_tpu.train import Trainer

    exp.trainer = Trainer(
        exp.model, exp.hcfg, exp.trainer.tx, exp.trainer.settings,
        eval_hierarchy_config=exp.eval_hcfg,
    )

    state = exp.run()
    assert exp.ckpt.latest_step() is not None

    # Resume path restores and continues without error.
    exp2 = Experiment(str(conf), str(dfaust_root), log_folder=str(log))
    exp2.model = exp.model
    exp2.trainer = Trainer(
        exp2.model, exp2.hcfg, exp2.trainer.tx, exp2.trainer.settings,
        eval_hierarchy_config=exp2.eval_hcfg,
    )
    exp2.run(resume=True, max_epochs=1)

    # The run persisted its resolved config; a reference-style test-regime
    # YAML overlays it into a working eval Experiment (tasks/test_seg.py
    # resolve_config path) with the test-time frame count applied.
    saved_conf = log / "config.yaml"
    assert saved_conf.exists()
    from se3conv3d_tpu.train.config import load_yaml_config, merge_test_config

    test_cfg = {
        "Testing": {"num_epochs": 2,
                    "RefFrames": {"pca": True, "fixed_axis": False,
                                  "n_frames": 2,
                                  "neigh_kwargs": {"neigh_k": 8}}},
        "Dataset": {"dataset": "dfaust", "split": "test",
                    "test_aug_file": "configs.dfaust.DFaust_DS_Aug_Val"},
    }
    merged, testing = merge_test_config(load_yaml_config(str(saved_conf)), test_cfg)
    assert testing["num_epochs"] == 2
    exp3 = Experiment(merged, str(dfaust_root), log_folder=str(log))
    assert exp3.eval_hcfg.frames.n_frames == 2
    assert exp3.hcfg.frames.n_frames == 1  # train count untouched
    assert exp3.ckpt.latest_step() is not None  # finds the checkpoints
