"""DFaust TRAIN augmentations for the SO(3) training regime: the I-regime
augs (``DFaust_DS_Aug``) plus a uniform SO(3) rotation every sample —
the rotation-augmented training row of the reference's regime table
(reference ``README.md:110`` regime naming; aug kwargs match
``RotationAug3D.py:34-111``)."""

DS_AUGMENTS = [
    {"name": "CenterAug", "p_apply_extra_tensors": []},
    {"name": "RotationAug3D", "p_prob": 1.0, "p_apply_extra_tensors": []},
    {"name": "NoiseAug", "p_prob": 1.0, "p_stddev": 0.005, "p_clip": 0.02,
     "p_apply_extra_tensors": []},
]
