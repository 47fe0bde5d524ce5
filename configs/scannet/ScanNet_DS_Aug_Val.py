"""ScanNet eval augmentations (values from reference
``tasks/SemSeg/confs/scannet/ScanNet_DS_Aug_Val.py``)."""

DS_AUGMENTS = [
    {"name": "CenterAug", "p_apply_extra_tensors": [False, False, False, False]},
]
