"""Geometry core: cameras, SE(3) poses, rotation conversions."""
from dro_sfm_tpu.geometry.camera import (
    Camera,
    invert_intrinsics,
    pixel_grid,
    scale_intrinsics,
    view_synthesis_coords,
)
from dro_sfm_tpu.geometry.pose import Pose, invert_pose, pose_vec_to_mat

__all__ = [
    "Camera",
    "Pose",
    "invert_intrinsics",
    "invert_pose",
    "pixel_grid",
    "pose_vec_to_mat",
    "scale_intrinsics",
    "view_synthesis_coords",
]
