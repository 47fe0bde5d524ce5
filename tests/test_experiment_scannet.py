"""ScanNet Experiment end-to-end: point-budget sampler batches ->
calibration -> train -> validate (mask_classes-aware metrics) on a
synthetic npz fixture (CPU, tiny shapes)."""
import dataclasses
import os

import numpy as np
import pytest

_YAML = """
Training:
    log_folder: '{log}'
    num_epochs: 1
    num_batches: 2
    pts_per_batch: 1024
    weight_decay: 0.0001
    max_lr: 0.005
    pct_start: 0.3
    clip_grads: 100.0
    label_smoothing: 0.2
    save_models_frequency: 1
    val_freq: 1

Dataset:
    dataset: 'scannet20'
    train_split: 'train'
    test_split: 'val'
    train_aug_file: 'configs.scannet.ScanNet_DS_Aug_zfixed'
    train_aug_color_file: 'configs.scannet.ScanNet_Color_DS_Aug'
    test_aug_file: 'configs.scannet.ScanNet_DS_Aug_Val'
    test_aug_color_file: 'None'
    prob_mix3d: 0.5
    train_scene_crop_ratio: 0.8
    train_scene_max_pts: 400

Model:
    model: FPNSegUNetMLPGeluRotEqScanNet
    max_drop_path: 0.2
    init_subsample: 0.1
    output_subsample: 0.12
    grid_subsamples: [0.4, 0.8]
    capacities: [512, 128, 48]
    out_capacity: 512
    max_neighbors: 8
    RefFrames:
        pca: True
        neigh_method: 'knn'
        neigh_kwargs:
            neigh_k: 8
        fixed_axis: 2
        train_n_frames: 1
        test_n_frames: 1
"""


@pytest.fixture()
def scannet_root(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "scannet"
    for sp, names in [("train", ["scene0000_00", "scene0001_00"]),
                      ("val", ["scene0002_00"])]:
        (root / sp).mkdir(parents=True)
        with open(root / f"scannet_{sp}.txt", "w") as f:
            f.write("\n".join(names) + "\n")
        for i, name in enumerate(names):
            n = 400 + 50 * i
            np.savez(
                root / sp / f"{name}.npz",
                points=rng.uniform(0, 3, (n, 3)).astype(np.float32),
                normals=rng.standard_normal((n, 3)).astype(np.float32),
                colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
                labels_20=rng.integers(0, 21, n).astype(np.int32),
            )
    with open(root / "color_stats.txt", "w") as f:
        f.write("0.5,0.5,0.5\n0.25,0.25,0.25\n")
    with open(root / "label_20_stats.txt", "w") as f:
        f.write("\n".join(["0.05"] * 21) + "\n")
    return str(root)


@pytest.mark.slow
def test_scannet_experiment_end_to_end(scannet_root, tmp_path):
    from se3conv3d_tpu.models import FPNSegUNet
    from se3conv3d_tpu.train import Trainer
    from se3conv3d_tpu.train.run import Experiment

    conf = tmp_path / "conf.yaml"
    conf.write_text(_YAML.format(log=tmp_path / "logs"))
    exp = Experiment(str(conf), scannet_root)
    assert exp.num_classes == 21
    assert exp.capacity == 512
    # ignore_label comes from the dataset's declared mask_classes
    assert exp.trainer.settings.ignore_label == 0

    spec = dataclasses.replace(
        exp.model.spec, patch_num_levels=1, patch_num_features=(8,),
        num_blocks=(1, 1), num_features=(8, 16), fpn_dec_feats=8,
    )
    exp.model = FPNSegUNet(spec, exp.num_in_feats, exp.num_classes)
    exp.trainer = Trainer(
        exp.model, exp.hcfg, exp.trainer.tx, exp.trainer.settings,
        eval_hierarchy_config=exp.eval_hcfg,
    )

    exp.run()
    assert exp.ckpt.latest_step() is not None
    state, _ = exp.ckpt.restore(exp.init_state())
    summary = exp.validate(state)
    assert np.isfinite(summary["miou"])
    # class 0 masked out of the averages per mask_classes
    assert len(summary["iou_per_class"]) == 21
