"""YAML config system: shipped configs parse into valid model/hierarchy
specs; RefFrames and TPU extension keys resolve correctly."""
import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3conv3d_tpu.models import ClassNet, FPNSegUNet
from se3conv3d_tpu.train.config import (
    build_model_from_config,
    frame_config_from_dict,
    hierarchy_config_from_model_dict,
    is_test_config,
    load_augmentations,
    load_yaml_config,
    merge_test_config,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CONFIGS = sorted(glob.glob(os.path.join(_REPO, "configs", "*", "*.yaml")))
TRAIN_CONFIGS = [p for p in ALL_CONFIGS if not is_test_config(load_yaml_config(p))]
TEST_CONFIGS = [p for p in ALL_CONFIGS if is_test_config(load_yaml_config(p))]


def _train_conf_for(test_path: str) -> str:
    """The training config each shipped test-regime config evaluates."""
    name = os.path.basename(test_path)
    pairs = {
        "modelnet40_test_rot.yaml": "modelnet40/modelnet40_pca_2F.yaml",
        "modelnet40_test_standard.yaml": "modelnet40/modelnet40_standard.yaml",
        "dfaust_test.yaml": "dfaust/dfaust_I_rot_pca_2F.yaml",
    }
    if name in pairs:
        return os.path.join(_REPO, "configs", pairs[name])
    variant = name.replace("scannet20_test_", "").rsplit("_", 2)[0]
    train_name = {
        "pca": "scannet20_rot_pca_SO2.yaml",
        "rot": "scannet20_rot_SO2.yaml",
        "standard": "scannet20_standard_SO2.yaml",
    }[variant]
    return os.path.join(_REPO, "configs", "scannet", train_name)


@pytest.mark.parametrize("path", TRAIN_CONFIGS, ids=os.path.basename)
def test_every_shipped_config_builds(path):
    cfg = load_yaml_config(path)
    md = cfg["Model"]
    hcfg = hierarchy_config_from_model_dict(md, 4096)
    assert hcfg.num_levels == len(md["grid_subsamples"]) + 1
    model = build_model_from_config(md, 3, 20)
    assert isinstance(model, (FPNSegUNet, ClassNet))
    # Aug modules import and are lists of registry-known names.
    from se3conv3d_tpu.data.augment import AugPipeline

    for key in ("train_aug_file", "test_aug_file", "train_aug_color_file"):
        augs = load_augmentations(cfg["Dataset"].get(key))
        AugPipeline(augs)  # raises on unknown names/kwargs


@pytest.mark.parametrize("path", TEST_CONFIGS, ids=os.path.basename)
def test_every_shipped_test_config_merges(path):
    """Every test-regime YAML overlays its paired training config into a
    buildable experiment config (the reference's test-script protocol,
    ``test_scannet_rot.py:225-260``)."""
    test_cfg = load_yaml_config(path)
    train_cfg = load_yaml_config(_train_conf_for(path))
    merged, testing = merge_test_config(train_cfg, test_cfg)
    assert int(testing["num_epochs"]) >= 1
    md = merged["Model"]
    model = build_model_from_config(md, 3, 20)
    assert isinstance(model, (FPNSegUNet, ClassNet))
    hierarchy_config_from_model_dict(md, 4096, train=False)
    # the eval regime's aug modules import cleanly
    from se3conv3d_tpu.data.augment import AugPipeline

    ds = merged["Dataset"]
    for key in ("test_aug_file", "test_aug_color_file"):
        AugPipeline(load_augmentations(ds.get(key)))
    # test YAMLs override the eval split explicitly
    if "split" in (test_cfg.get("Dataset") or {}):
        assert ds["test_split"] == test_cfg["Dataset"]["split"]
    # RefFrames overrides land in the eval frame config
    rf = (test_cfg.get("Testing") or {}).get("RefFrames")
    if rf:
        fc = frame_config_from_dict(md["RefFrames"], train=False)
        assert fc.n_frames == int(rf["n_frames"])
        assert fc.pca == bool(rf.get("pca", True))


def test_merge_test_config_semantics():
    train = {
        "Training": {"num_epochs": 600, "batch_size": 32},
        "Dataset": {
            "dataset": "scannet20", "train_split": "train",
            "test_split": "val",
            "train_aug_file": "configs.scannet.ScanNet_DS_Aug_zfixed",
            "test_aug_file": "configs.scannet.ScanNet_DS_Aug_Val",
        },
        "Model": {
            "model": "FPNSegUNetMLPGeluRotEqScanNet",
            "RefFrames": {"pca": True, "fixed_axis": 2,
                          "train_n_frames": 1, "test_n_frames": 1,
                          "neigh_kwargs": {"neigh_k": 16}},
        },
    }
    test = {
        "Testing": {"num_epochs": 30, "save_folder": "preds",
                    "batch_size": 8,
                    "RefFrames": {"pca": False, "fixed_axis": 2,
                                  "n_frames": 4}},
        "Dataset": {"dataset": "scannet20", "split": "test",
                    "test_aug_file": "configs.scannet.ScanNet_DS_Aug_Test"},
    }
    merged, testing = merge_test_config(train, test)
    # training dict untouched (deep copy)
    assert train["Dataset"]["test_aug_file"].endswith("Val")
    assert train["Model"]["RefFrames"]["pca"] is True
    # split mapping + aug override
    assert merged["Dataset"]["test_split"] == "test"
    assert merged["Dataset"]["test_aug_file"].endswith("Test")
    assert merged["Dataset"]["train_aug_file"].endswith("zfixed")
    # RefFrames: test-time values override, train_n_frames preserved
    rf = merged["Model"]["RefFrames"]
    assert rf["pca"] is False and rf["test_n_frames"] == 4
    assert rf["train_n_frames"] == 1
    assert rf["neigh_kwargs"]["neigh_k"] == 16  # untouched keys survive
    # batch_size + the raw Testing dict pass through
    assert merged["Training"]["batch_size"] == 8
    assert testing["save_folder"] == "preds"
    # a training-shaped config is not a test config
    assert not is_test_config(train) and is_test_config(test)


def test_frame_config_train_test_split():
    d = {
        "pca": True, "neigh_method": "knn",
        "neigh_kwargs": {"neigh_k": 16}, "fixed_axis": 2,
        "train_n_frames": 1, "test_n_frames": 4,
    }
    train = frame_config_from_dict(d, train=True)
    test = frame_config_from_dict(d, train=False)
    assert train.n_frames == 1 and test.n_frames == 4
    assert train.fixed_axis == 2 and train.neigh_k == 16
    assert frame_config_from_dict(None) is None


def test_model_overrides_apply():
    md = {
        "model": "FPNSegUNetMLPGeluRotEqFAUST",
        "max_drop_path": 0.3,
        "max_neighbors": 24,
        "init_subsample": 0.04,
        "grid_subsamples": [0.05, 0.1, 0.2, 0.4],
    }
    model = build_model_from_config(md, 1, 20)
    assert model.spec.max_path_drop == 0.3
    assert model.spec.max_neighbors == 24
    assert model.spec.equivariant

def test_lean_vjp_override():
    """YAML `Model.lean_vjp: true` opts into the inputs-only lean VJP
    (drops remat on the fused path); the default is the memory-safe
    autodiff-residuals + remat config (the lean no-remat mode OOMs the
    batch-32 DFaust recipe at compile time, r3 session K)."""
    from se3conv3d_tpu.nn.conv import ConvFactory, PNEConv

    md = {
        "model": "FPNSegUNetMLPGeluRotEqFAUST",
        "init_subsample": 0.04,
        "grid_subsamples": [0.05, 0.1],
        "lean_vjp": True,
    }
    model = build_model_from_config(md, 1, 20)
    assert model.spec.conv.lean_vjp is True
    assert model.spec.conv_blocks.lean_vjp is True
    # Default (no key): lean stays OFF (memory-safe remat).
    del md["lean_vjp"]
    model = build_model_from_config(md, 1, 20)
    assert model.spec.conv.lean_vjp is False

    # Factory: fused + lean -> bare PNEConv (inputs-only residuals need no
    # remat); lean off -> remat-wrapped class; non-fused configs keep remat
    # regardless.
    # use_fused=True: on the CPU test backend the auto-dispatch would
    # pick the XLA path and remat unconditionally.
    fused = dict(pne_type="mlp_gelu", equivariant=True, remat=True,
                 use_fused=True)
    lean = ConvFactory(**fused, lean_vjp=True).make(8, 8)
    assert type(lean) is PNEConv and lean.lean_vjp is True
    fat = ConvFactory(**fused, lean_vjp=False).make(8, 8)
    assert type(fat) is not PNEConv  # nn.remat subclass
    kp = ConvFactory(pne_type="kp_gauss", equivariant=False, remat=True,
                     lean_vjp=True).make(8, 8)
    assert type(kp) is not PNEConv


def test_compute_dtype_override():
    md = {
        "model": "FPNSegUNetMLPGeluRotEqFAUST",
        "init_subsample": 0.04,
        "grid_subsamples": [0.05, 0.1],
        "compute_dtype": "bfloat16",
    }
    model = build_model_from_config(md, 1, 20)
    assert model.spec.conv.compute_dtype == "bfloat16"
    assert model.spec.conv_blocks.compute_dtype == "bfloat16"


def test_remat_override():
    """Model.remat: false (the r5 bf16 ScanNet recipes) reaches the conv
    factories; a config without the key keeps the safe default (True)."""
    md = {
        "model": "FPNSegUNetMLPGeluRotEqScanNet",
        "init_subsample": 0.1,
        "grid_subsamples": [0.2, 0.4, 0.8, 1.6],
        "compute_dtype": "bfloat16",
        "remat": False,
    }
    model = build_model_from_config(md, 3, 21)
    assert model.spec.conv.remat is False
    assert model.spec.conv_blocks.remat is False
    del md["remat"]
    model = build_model_from_config(md, 3, 21)
    assert model.spec.conv.remat is True


def test_sorted_bwd_mode_keeps_remat(monkeypatch):
    """SE3CONV_BWD_MODE=sorted disables the lean inputs-only VJP inside
    the fused conv (sorted tables need the autodiff residual path), so
    the factory must keep nn.remat on — otherwise every conv holds its
    un-rematerialized [B,M,E,C] residuals and big recipes OOM."""
    from se3conv3d_tpu.nn import conv as conv_mod
    from se3conv3d_tpu.nn.conv import ConvFactory, PNEConv

    f = ConvFactory(pne_type="mlp_gelu", equivariant=True, remat=True,
                    use_fused=True, lean_vjp=True)
    assert type(f.make(8, 8)) is PNEConv  # scatter mode: lean, no remat
    monkeypatch.setattr(conv_mod.ops, "BWD_SCATTER_MODE", "sorted")
    assert type(f.make(8, 8)) is not PNEConv  # sorted mode: remat again
