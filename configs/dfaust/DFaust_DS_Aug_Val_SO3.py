"""DFaust eval augmentations with uniform SO(3) rotation — the rotated
test regime for measuring the invariance gap of an I-trained model
(reference regime naming, README.md:110)."""

DS_AUGMENTS = [
    {"name": "CenterAug", "p_apply_extra_tensors": []},
    {"name": "RotationAug3D", "p_prob": 1.0, "p_apply_extra_tensors": []},
]
