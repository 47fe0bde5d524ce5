"""ScanNet test-time voting augmentations: one deterministic z-rotation
per vote epoch sweeping the full circle (values from reference
``tasks/SemSeg/confs/scannet/ScanNet_DS_Aug_Test.py``).  The SO(2) eval
regime of the `scannet20_test_*_SO2.yaml` configs: vote epoch ``i``
rotates every scene by ``i/30 * 2*pi`` via ``RotationAug.p_angle_values``
(the pipeline's epoch counter indexes the list).
"""
import numpy as np

num_test_epochs = 30

DS_AUGMENTS = [
    {"name": "CenterAug", "p_apply_extra_tensors": [False, False, False, False]},
    {"name": "RotationAug", "p_prob": 1.0, "p_axis": 2,
     "p_angle_values": [
         (i / num_test_epochs) * 2.0 * np.pi for i in range(num_test_epochs)
     ],
     "p_apply_extra_tensors": [True, False, False, False]},
]
