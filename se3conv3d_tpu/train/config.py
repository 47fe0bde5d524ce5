"""YAML experiment configuration (reference-compatible schema).

Parses the three-section YAML layout of the reference task configs —
``Training`` / ``Dataset`` / ``Model`` with the ``Model.RefFrames``
frame-sampling sub-dict (reference ``train_dfaust_rot.py:439-468,560-565``;
e.g. ``confs/dfaust/dfaust_I_rot_pca_2F.yaml``) — into the framework's
static configs.  Shipped reference YAMLs parse unchanged; TPU-specific
optional keys extend the ``Model`` section:

  * ``capacities`` / ``out_capacity``: static per-level point capacities
    (default: ``num_points`` halved per level),
  * ``max_neighbors``: static ball-query cap (preset defaults: 24 for the
    seg presets — measured lossless on grid-subsampled surface data — 32
    for class/FAUST presets whose patch stem queries the raw cloud),
  * ``lean_vjp``: inputs-only conv VJP on the fused path (default false =
    autodiff residuals + remat, ~5% faster and memory-safe for batched
    recipes; true drops remat — single-scene recipes only).

Augmentation configs are Python modules exporting ``DS_AUGMENTS`` lists
imported by dotted path, exactly like the reference (``:32-39``).
"""
from __future__ import annotations

import dataclasses
import importlib
from typing import Any, Dict, Optional, Tuple

import yaml

from ..core.hierarchy import FrameConfig, HierarchyConfig
from ..models import ClassNet, FPNSegUNet, get_model_spec
from ..models.presets import CLASS_PRESETS, SEG_PRESETS

__all__ = [
    "load_yaml_config",
    "is_test_config",
    "merge_test_config",
    "frame_config_from_dict",
    "hierarchy_config_from_model_dict",
    "build_model_from_config",
    "load_augmentations",
]


def load_yaml_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    for section in ("Training", "Dataset", "Model"):
        cfg.setdefault(section, {})
    return cfg


def is_test_config(cfg: Dict[str, Any]) -> bool:
    """True for the reference's test-regime YAML shape: a ``Testing``
    section and no ``Model`` section (e.g.
    ``confs/scannet/scannet20_test_pca_I_SO2.yaml``)."""
    return bool(cfg.get("Testing")) and not cfg.get("Model")


def merge_test_config(
    train_cfg: Dict[str, Any], test_cfg: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Overlay a test-regime YAML onto the training config it evaluates.

    The reference's test scripts take the model architecture from the
    checkpoint payload and ONLY the test-time regime from the test YAML
    (``test_scannet_rot.py:225-260``): the eval split + augmentation
    modules from its ``Dataset`` section, and the frame-sampling
    overrides / vote count / output folder from ``Testing``.  Returns
    ``(merged_cfg, testing)`` where ``merged_cfg`` follows the training
    schema (so ``Experiment`` consumes it unchanged) and ``testing`` is
    the raw ``Testing`` dict (``num_epochs`` = vote epochs,
    ``save_folder`` = prediction output dir).
    """
    import copy

    merged = copy.deepcopy(train_cfg)
    testing = dict(test_cfg.get("Testing") or {})
    ds = dict(test_cfg.get("Dataset") or {})
    out_ds = merged.setdefault("Dataset", {})
    if "split" in ds:
        # the test schema names the eval split 'split'
        out_ds["test_split"] = ds.pop("split")
    out_ds.update(ds)
    rf = testing.get("RefFrames")
    if rf:
        model_rf = dict(merged.setdefault("Model", {}).get("RefFrames") or {})
        model_rf.update({k: v for k, v in rf.items() if k != "n_frames"})
        if "n_frames" in rf:
            # test-time frame count; training's value stays authoritative
            # for train_n_frames (unused at eval)
            model_rf["test_n_frames"] = int(rf["n_frames"])
        merged["Model"]["RefFrames"] = model_rf
    if "batch_size" in testing:
        # eval batch size (reference modelnet40_test_rot.yaml:3)
        merged.setdefault("Training", {})["batch_size"] = testing["batch_size"]
    return merged, testing


def load_augmentations(dotted_path: Optional[str]):
    """Import a ``DS_AUGMENTS`` list by dotted module path (reference
    ``train_dfaust_rot.py:32-39``); 'None'/empty -> no augs."""
    if not dotted_path or dotted_path == "None":
        return []
    module = importlib.import_module(dotted_path)
    return list(module.DS_AUGMENTS)


def frame_config_from_dict(
    ref_frames: Optional[Dict[str, Any]], train: bool = True
) -> Optional[FrameConfig]:
    """``Model.RefFrames`` -> FrameConfig.

    Keys follow the reference exactly: ``pca``, ``neigh_method``,
    ``neigh_kwargs.neigh_k``/``bq_radius``, ``fixed_axis``,
    ``train_n_frames``/``test_n_frames`` (reference
    ``pc/PointcloudRotEquiv.py:16-52``)."""
    if not ref_frames:
        return None
    kwargs = ref_frames.get("neigh_kwargs", {}) or {}
    n_frames = ref_frames.get(
        "train_n_frames" if train else "test_n_frames",
        ref_frames.get("n_frames", 2),
    )
    return FrameConfig(
        n_frames=int(n_frames),
        pca=bool(ref_frames.get("pca", True)),
        fixed_axis=ref_frames.get("fixed_axis", False),
        neigh_method=ref_frames.get("neigh_method", "knn"),
        neigh_k=int(kwargs.get("neigh_k", 16)),
        bq_radius=float(kwargs.get("bq_radius", 0.0)),
    )


def _default_capacities(num_points: int, num_levels: int) -> Tuple[int, ...]:
    caps = []
    cap = num_points
    for _ in range(num_levels):
        caps.append(max(cap, 32))
        cap = max(cap // 2, 32)
    return tuple(caps)


def hierarchy_config_from_model_dict(
    model_dict: Dict[str, Any],
    num_points: int,
    train: bool = True,
    with_output: Optional[bool] = None,
) -> HierarchyConfig:
    """``Model`` section -> HierarchyConfig.

    ``init_subsample`` / ``grid_subsamples`` / ``output_subsample``
    semantics follow reference ``create_hierarchy``
    (``train_dfaust_rot.py:108-158``)."""
    cell_sizes = tuple(float(c) for c in model_dict["grid_subsamples"])
    n_levels = len(cell_sizes) + 1
    caps = model_dict.get("capacities")
    caps = (
        tuple(int(c) for c in caps)
        if caps is not None
        else _default_capacities(num_points, n_levels)
    )
    out_cell = model_dict.get("output_subsample")
    if with_output is False:
        out_cell = None
    return HierarchyConfig(
        init_cell_size=float(model_dict["init_subsample"]),
        cell_sizes=cell_sizes,
        capacities=caps,
        out_cell_size=float(out_cell) if out_cell is not None else None,
        out_capacity=int(model_dict.get("out_capacity", num_points)),
        frames=frame_config_from_dict(model_dict.get("RefFrames"), train),
    )


def build_model_from_config(
    model_dict: Dict[str, Any], num_in_feats: int, num_classes: int
):
    """``Model.model`` preset name -> flax module (the analogue of the
    reference's importlib model lookup, ``train_dfaust_rot.py:82-88``)."""
    name = model_dict["model"]
    overrides = {}
    if "max_neighbors" in model_dict:
        overrides["max_neighbors"] = int(model_dict["max_neighbors"])
    if "max_drop_path" in model_dict:
        overrides["max_path_drop"] = float(model_dict["max_drop_path"])
    if "cache_equiv_geometry" in model_dict:
        overrides["cache_equiv_geometry"] = bool(model_dict["cache_equiv_geometry"])
    spec = get_model_spec(name, **overrides)
    if "compute_dtype" in model_dict:
        # Mixed-precision convs (bf16 multiplies, f32 accumulation).
        cdt = model_dict["compute_dtype"]
        spec = dataclasses.replace(
            spec,
            conv=dataclasses.replace(spec.conv, compute_dtype=cdt),
            conv_blocks=dataclasses.replace(spec.conv_blocks, compute_dtype=cdt),
        )
    if "remat" in model_dict:
        # False = keep autodiff conv residuals instead of rematerializing
        # them in the backward.  Memory-safe only where the residuals fit
        # (measured: ScanNet scan_scenes/B=1 at 131k-pt capacities fits a
        # 16G chip and runs ~15-20% faster; the batch-32 DFaust recipe
        # does NOT fit).  The bf16 ScanNet recipes ship remat: false.
        rm = bool(model_dict["remat"])
        spec = dataclasses.replace(
            spec,
            conv=dataclasses.replace(spec.conv, remat=rm),
            conv_blocks=None if spec.conv_blocks is None
            else dataclasses.replace(spec.conv_blocks, remat=rm),
        )
    if "lean_vjp" in model_dict:
        # True = inputs-only lean VJP (drops remat; single-scene recipes
        # only — see ConvFactory.lean_vjp); False/default = autodiff
        # residuals + remat.
        lv = bool(model_dict["lean_vjp"])
        spec = dataclasses.replace(
            spec,
            conv=dataclasses.replace(spec.conv, lean_vjp=lv),
            conv_blocks=None if spec.conv_blocks is None
            else dataclasses.replace(spec.conv_blocks, lean_vjp=lv),
        )
    if name in SEG_PRESETS:
        return FPNSegUNet(spec, num_in_feats=num_in_feats, num_classes=num_classes)
    if name in CLASS_PRESETS:
        return ClassNet(spec, num_in_feats=num_in_feats, num_classes=num_classes)
    raise KeyError(name)
