"""Task-CLI config resolution: training YAMLs pass through; reference-
style test-regime YAMLs overlay the trained run's config (via
--train_conf or the log folder's saved config.yaml)."""
import argparse
import os
import sys

import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tasks.test_seg import resolve_config  # noqa: E402

_TRAIN = {
    "Training": {"num_epochs": 2, "batch_size": 4},
    "Dataset": {"dataset": "dfaust", "num_points": 96,
                "test_aug_file": "configs.dfaust.DFaust_DS_Aug_Val"},
    "Model": {"model": "FPNSegUNetMLPGeluRotEqFAUST",
              "init_subsample": 0.1, "grid_subsamples": [0.2, 0.4],
              "RefFrames": {"pca": True, "train_n_frames": 1,
                            "test_n_frames": 1}},
}
_TEST = {
    "Testing": {"num_epochs": 7,
                "RefFrames": {"pca": True, "n_frames": 2}},
    "Dataset": {"dataset": "dfaust", "split": "test",
                "test_aug_file": "configs.dfaust.DFaust_DS_Aug_Val_SO3"},
}


def _args(**kw):
    ns = argparse.Namespace(train_conf=None, log_folder=None)
    vars(ns).update(kw)
    return ns


def _dump(tmp_path, name, cfg):
    p = tmp_path / name
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_training_yaml_passes_through(tmp_path):
    conf = _dump(tmp_path, "train.yaml", _TRAIN)
    cfg, testing = resolve_config(_args(conf_file=conf))
    assert cfg["Model"]["model"] == "FPNSegUNetMLPGeluRotEqFAUST"
    assert testing == {}


def test_test_yaml_with_train_conf(tmp_path):
    train = _dump(tmp_path, "train.yaml", _TRAIN)
    test = _dump(tmp_path, "test.yaml", _TEST)
    cfg, testing = resolve_config(_args(conf_file=test, train_conf=train))
    assert testing["num_epochs"] == 7
    assert cfg["Dataset"]["test_split"] == "test"
    assert cfg["Dataset"]["test_aug_file"].endswith("SO3")
    assert cfg["Model"]["RefFrames"]["test_n_frames"] == 2


def test_test_yaml_finds_saved_config_in_log_folder(tmp_path):
    log = tmp_path / "logs"
    log.mkdir()
    (log / "config.yaml").write_text(yaml.safe_dump(_TRAIN))
    test = _dump(tmp_path, "test.yaml", _TEST)
    cfg, testing = resolve_config(
        _args(conf_file=test, log_folder=str(log))
    )
    assert cfg["Model"]["model"] == "FPNSegUNetMLPGeluRotEqFAUST"
    assert testing["num_epochs"] == 7


def test_test_yaml_without_train_conf_errors(tmp_path):
    test = _dump(tmp_path, "test.yaml", _TEST)
    with pytest.raises(SystemExit, match="train_conf"):
        resolve_config(_args(conf_file=test))
