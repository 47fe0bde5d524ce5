from .dfaust import (
    merge_joint_labels,
    pose_smpl_body,
    sample_labelled_cloud,
    sample_surface_even,
    save_model_files,
)
