"""Classification Experiment end-to-end: ModelNet config -> datasets ->
calibration -> train -> validate (accuracy) -> checkpoint (CPU, tiny)."""
import numpy as np
import pytest

_YAML = """
Training:
    log_folder: '{log}'
    num_epochs: 1
    batch_size: 2
    weight_decay: 0.0001
    max_lr: 0.005
    pct_start: 0.3
    clip_grads: 100.0
    label_smoothing: 0.2
    save_models_frequency: 1
    val_freq: 1

Dataset:
    dataset: 'modelnet40'
    num_points: 96

Model:
    model: ClassNetRotEquivMLPGELU19Former
    max_drop_path: 0.1
    init_subsample: 0.1
    grid_subsamples: [0.2, 0.4]
    capacities: [96, 48, 24]
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
def mn40_root(tmp_path):
    rng = np.random.default_rng(0)
    names = ["airplane", "bed"]
    with open(tmp_path / "modelnet40_shape_names.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    files = {"train": [], "test": []}
    for split, per_class in [("train", 2), ("test", 1)]:
        for cls in names:
            d = tmp_path / cls
            d.mkdir(exist_ok=True)
            for i in range(per_class):
                name = f"{cls}_{split}{i:04d}"
                data = rng.standard_normal((96, 6)).astype(np.float32) * 0.3
                np.savetxt(d / (name + ".txt"), data, delimiter=",")
                files[split].append(name)
    for split in ("train", "test"):
        with open(tmp_path / f"modelnet40_{split}.txt", "w") as f:
            f.write("\n".join(files[split]) + "\n")
    return tmp_path


@pytest.mark.slow
def test_classification_experiment_end_to_end(mn40_root, tmp_path):
    import dataclasses

    from se3conv3d_tpu.models import ClassNet
    from se3conv3d_tpu.train import Trainer
    from se3conv3d_tpu.train.run import Experiment

    conf = tmp_path / "conf.yaml"
    conf.write_text(_YAML.format(log=tmp_path / "logs"))

    exp = Experiment(str(conf), str(mn40_root))
    assert exp.task == "classification"
    spec = dataclasses.replace(
        exp.model.spec, patch_num_levels=1, patch_num_features=(8,),
        num_blocks=(1, 1), num_features=(8, 16),
    )
    exp.model = ClassNet(spec, exp.num_in_feats, num_classes=40)
    exp.trainer = Trainer(
        exp.model, exp.hcfg, exp.trainer.tx, exp.trainer.settings,
        eval_hierarchy_config=exp.eval_hcfg,
    )

    exp.run()
    assert exp.ckpt.latest_step() is not None
    state, _ = exp.ckpt.restore(exp.init_state())
    summary = exp.validate(state)
    assert 0.0 <= summary["accuracy"] <= 1.0
