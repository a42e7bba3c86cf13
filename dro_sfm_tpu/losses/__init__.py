"""Losses: photometric (self-supervised) and supervised depth/pose."""
from dro_sfm_tpu.losses.photometric import (
    PhotometricLossConfig,
    multiview_photometric_loss,
    smoothness_loss,
    warp_context,
)
from dro_sfm_tpu.losses.supervised import (
    SupervisedLossConfig,
    berhu_loss,
    get_loss_fn,
    silog_loss,
    supervised_depth_loss,
    supervised_depth_pose_loss,
    supervised_pose_loss,
)
