"""DFaust TRAIN augmentations for the SO(2) training regime: I-regime
augs plus a full-circle rotation about the z axis — the DFaust-scale
mirror of the reference's z-fixed ScanNet regime
(``ScanNet_DS_Aug_zfixed.py`` RotationAug row; pairs with
``RefFrames.fixed_axis: 2``)."""
import numpy as np

DS_AUGMENTS = [
    {"name": "CenterAug", "p_apply_extra_tensors": []},
    {"name": "RotationAug", "p_prob": 1.0, "p_axis": 2,
     "p_min_angle": 0.0, "p_max_angle": 2.0 * np.pi,
     "p_apply_extra_tensors": []},
    {"name": "NoiseAug", "p_prob": 1.0, "p_stddev": 0.005, "p_clip": 0.02,
     "p_apply_extra_tensors": []},
]
