"""Networks and task models."""
from dro_sfm_tpu.models.depth_pose_net import (
    DepthPoseNet,
    VersionSpec,
    depth2inv,
    disp_to_depth,
    inv2depth,
)
from dro_sfm_tpu.models.encoder import ResNetEncoder
from dro_sfm_tpu.models.sfm import SfmModelConfig, compute_loss, forward, forward_and_loss

__all__ = [
    "DepthPoseNet",
    "ResNetEncoder",
    "SfmModelConfig",
    "VersionSpec",
    "compute_loss",
    "depth2inv",
    "disp_to_depth",
    "forward",
    "forward_and_loss",
    "inv2depth",
]
