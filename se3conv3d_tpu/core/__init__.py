from .pointcloud import (
    PointCloud,
    bounding_boxes,
    frame_pool,
    global_pool,
    masked_max,
    masked_mean,
    masked_min,
    masked_sum,
)
from .rotation import (
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    planar_rotations,
    quaternion_to_matrix,
    random_quaternions,
    random_rotations,
    relative_rotations,
    to_local_direction,
    to_local_points,
)
from .frames import (
    global_pca_frames,
    pca_frames,
    pca_frames_from_components,
    random_frames,
    shuffle_and_select_frames,
)
from .grid import SubsampleMap, build_grid_subsample, grid_subsample_cloud
from .neighborhoods import Neighborhood, ball_query_neighborhood, knn_neighborhood
from .hierarchy import (
    FrameConfig,
    Hierarchy,
    HierarchyConfig,
    attach_frames,
    build_hierarchy,
)
from .fps import FPSMap, fps_subsample, fps_subsample_cloud
