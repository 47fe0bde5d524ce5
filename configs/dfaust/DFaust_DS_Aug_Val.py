"""DFaust eval augmentations (values from reference
``tasks/SemSeg/confs/dfaust/DFaust_DS_Aug_Val.py``)."""

DS_AUGMENTS = [
    {"name": "CenterAug", "p_apply_extra_tensors": []},
]
