"""DFaust EVAL augmentations with a uniform z-axis rotation — the
rotated test regime of the SO(2) training setup (the DFaust-scale mirror
of the reference's ``scannet20_test_*_SO2`` regime)."""
import numpy as np

DS_AUGMENTS = [
    {"name": "CenterAug", "p_apply_extra_tensors": []},
    {"name": "RotationAug", "p_prob": 1.0, "p_axis": 2,
     "p_min_angle": 0.0, "p_max_angle": 2.0 * np.pi,
     "p_apply_extra_tensors": []},
]
