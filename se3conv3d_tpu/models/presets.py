"""Named model presets matching the reference task model zoo.

Name-for-name counterparts of the concrete model subclasses in reference
``tasks/SemSeg/seg_models.py`` and ``tasks/Classification/class_models.py``,
resolved by ``get_model_spec(name)`` the way the reference task scripts
resolve model classes by name via importlib
(``train_dfaust_rot.py:82-88``).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

from ..nn.conv import ConvFactory
from .spec import ModelSpec

__all__ = ["get_model_spec", "SEG_PRESETS", "CLASS_PRESETS", "mlp_gelu_conv"]


def mlp_gelu_conv(equivariant: bool) -> ConvFactory:
    """The conv factory every shipped config uses: 32-basis mlp_gelu PNE
    (reference ``seg_models.py:62-76``, ``class_models.py:63-73``)."""
    return ConvFactory(num_basis=32, pne_type="mlp_gelu", equivariant=equivariant)


def _faust_spec(equivariant: bool) -> ModelSpec:
    """Reference ``FPNSegUNetFAUST`` (``seg_models.py:16-36``)."""
    return ModelSpec(
        conv=mlp_gelu_conv(equivariant),
        patch_num_levels=1,
        patch_num_features=(32,),
        patch_radius_scale=2.0,
        num_blocks=(2, 2, 2, 2),
        num_features=(32, 64, 128, 256),
        radius_scale=2.0,
        radius_scale_dec=2.0,
        radius_scale_blocks=2.0,
        fpn_dec_feats=32,
        num_hidden_seg_head=0,
        # patch stem ball-queries the RAW cloud — denser than the
        # subsampled levels the 24-cap occupancy measurement covers
        max_neighbors=32,
    )


def _scannet_spec(equivariant: bool) -> ModelSpec:
    """Reference ``FPNSegUNetScanNet`` (``seg_models.py:39-59``)."""
    return ModelSpec(
        conv=mlp_gelu_conv(equivariant),
        patch_num_levels=0,
        patch_num_features=(),
        patch_radius_scale=2.0,
        num_blocks=(2, 3, 4, 6, 4),
        num_features=(64, 128, 192, 256, 320),
        radius_scale=2.0,
        radius_scale_dec=2.0,
        radius_scale_blocks=2.0,
        fpn_dec_feats=128,
        num_hidden_seg_head=0,
    )


def _classnet19_spec(equivariant: bool, frame_pooling=None) -> ModelSpec:
    """Reference ``ClassNet19Former`` / ``...Max``
    (``class_models.py:15-59``).  ClassNet wires the block conv radius/knn
    to the main ones (``models/ClassNet.py:66-67``)."""
    return ModelSpec(
        conv=mlp_gelu_conv(equivariant),
        patch_num_levels=1,
        patch_num_features=(32,),
        patch_radius_scale=2.0,
        num_blocks=(2, 3, 4, 6, 4),
        num_features=(32, 64, 128, 256, 512),
        radius_scale=2.0,
        radius_scale_blocks=2.0,
        pooling_method="avg",
        frame_pooling_method=frame_pooling,
        # patch stem ball-queries the RAW cloud — denser than the
        # subsampled levels the 24-cap occupancy measurement covers
        max_neighbors=32,
    )


SEG_PRESETS: Dict[str, callable] = {
    "FPNSegUNetMLPGeluFAUST": lambda: _faust_spec(False),
    "FPNSegUNetMLPGeluRotEqFAUST": lambda: _faust_spec(True),
    "FPNSegUNetMLPGeluScanNet": lambda: _scannet_spec(False),
    "FPNSegUNetMLPGeluRotEqScanNet": lambda: _scannet_spec(True),
}

CLASS_PRESETS: Dict[str, callable] = {
    "ClassNetMLPGELU19Former": lambda: _classnet19_spec(False),
    "ClassNetRotEquivMLPGELU19Former": lambda: _classnet19_spec(True),
    "ClassNetRotEquivMLPGELU19FormerMax": lambda: _classnet19_spec(
        True, frame_pooling="max"
    ),
}


def get_model_spec(name: str, **overrides) -> ModelSpec:
    """Resolve a preset by its reference model-class name."""
    table = {**SEG_PRESETS, **CLASS_PRESETS}
    if name not in table:
        raise KeyError(
            f"unknown model preset {name!r}; available: {sorted(table)}"
        )
    spec = table[name]()
    return dataclasses.replace(spec, **overrides) if overrides else spec
