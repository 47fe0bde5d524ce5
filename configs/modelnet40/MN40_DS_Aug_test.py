"""ModelNet40 unrotated test augmentations — centering only (values from
reference ``tasks/Classification/confs/MN40_DS_Aug_test.py``)."""

DS_AUGMENTS = [
    {"name": "CenterAug", "p_apply_extra_tensors": [False]},
]
