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
    load_augmentations,
    load_yaml_config,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CONFIGS = sorted(glob.glob(os.path.join(_REPO, "configs", "*", "*.yaml")))


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=os.path.basename)
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
    """YAML `Model.lean_vjp: false` restores autodiff residuals + remat on
    the fused path (ConvFactory.make wraps in nn.remat again)."""
    from se3conv3d_tpu.nn.conv import ConvFactory, PNEConv

    md = {
        "model": "FPNSegUNetMLPGeluRotEqFAUST",
        "init_subsample": 0.04,
        "grid_subsamples": [0.05, 0.1],
        "lean_vjp": False,
    }
    model = build_model_from_config(md, 1, 20)
    assert model.spec.conv.lean_vjp is False
    assert model.spec.conv_blocks.lean_vjp is False
    # Default (no key): lean stays on.
    del md["lean_vjp"]
    model = build_model_from_config(md, 1, 20)
    assert model.spec.conv.lean_vjp is True

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
