"""ModelNet40 test augmentations, uniform SO(3) rotation (values from
reference ``tasks/Classification/confs/MN40_DS_Aug_test_rot3D.py``)."""

DS_AUGMENTS = [
    {"name": "CenterAug", "p_apply_extra_tensors": [False]},
    {"name": "RotationAug3D", "p_prob": 1.0, "p_apply_extra_tensors": [True]},
]
