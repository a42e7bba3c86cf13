"""Inference library: checkpoint loading, sliding-window SfM, depth fusion.

The engine behind the inference CLIs, rebuilding the core logic of
`/root/reference/scripts/infer_video.py`:

* 3-frame sliding-window depth+pose inference (`infer_and_save_pose
  :139-227`),
* monocular scale chaining + global trajectory accumulation (`:638-666`),
* multi-view geometric-consistency depth filtering & fusion
  (`reproject_with_depth_batch :254-310`,
  `check_geometric_consistency_batch :312-335`,
  `gemo_filter_fusion :338-369`) as pure jnp,
* depth gradient / range / border filtering (`:648-659`).
"""
from __future__ import annotations

import json
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.geometry.pose import Pose
from dro_sfm_tpu.models.depth_pose_net import DepthPoseNet, inv2depth
from dro_sfm_tpu.training.checkpoint import load_checkpoint
from dro_sfm_tpu.utils.config import ConfigNode, prepare_config


def load_model(checkpoint_path: str,
               ) -> Tuple[DepthPoseNet, Dict, ConfigNode]:
    """Load a trained network + variables + config from a checkpoint."""
    restored = load_checkpoint(checkpoint_path)
    cfg = prepare_config(ConfigNode(restored["meta"]["config"]))
    min_depth = cfg.model.params.min_depth or 0.1
    net = DepthPoseNet(version=cfg.model.depth_net.version,
                       min_depth=min_depth,
                       max_depth=cfg.model.params.max_depth)
    variables = {"params": restored["payload"]["params"],
                 "batch_stats": restored["payload"]["batch_stats"]}
    return net, variables, cfg


def make_infer_fn(net: DepthPoseNet):
    """Jitted (target [1,H,W,3], refs [1,N,H,W,3], K [1,3,3]) ->
    (depth [H,W], pose mats [N,4,4])."""

    @jax.jit
    def fn(variables, target, refs, K):
        out = net.apply(variables, target, refs, K, train=False,
                        last_only=True)
        inv_depth = out["inv_depths"][-1, 0, ..., 0]       # [H,W]
        pose_vecs = out["pose_vecs"][0, :, -1]             # [N,6]
        return inv2depth(inv_depth), Pose.from_vec(pose_vecs, "euler").mat

    return fn


# ---------------------------------------------------------------------------
# Geometric-consistency fusion (jnp, parity with infer_video.py:254-369)
# ---------------------------------------------------------------------------

def _unproject(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """depth [H,W] -> camera-frame points [H,W,3]."""
    h, w = depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=depth.dtype),
                          jnp.arange(w, dtype=depth.dtype), indexing="ij")
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    return (pix @ jnp.linalg.inv(K).T) * depth[..., None]


def reproject_with_depth(depth_ref: jnp.ndarray, depth_src: jnp.ndarray,
                         T_ref: jnp.ndarray, T_src: jnp.ndarray,
                         K: jnp.ndarray):
    """Project reference depth into the source view and back.

    T_* are camera->world poses; sampling of the source depth is nearest
    with zeros padding (parity: `reproject_with_depth_batch`).
    Returns (depth_reprojected [H,W], x_reproj [H,W], y_reproj [H,W]).
    """
    h, w = depth_ref.shape
    xyz_ref = _unproject(depth_ref, K)                         # [H,W,3]
    rel = jnp.linalg.inv(T_src) @ T_ref                        # ref cam -> src cam
    xyz_src = xyz_ref @ rel[:3, :3].T + rel[:3, 3]
    proj = xyz_src @ K.T
    z = jnp.maximum(proj[..., 2], 1e-10)
    x_src = proj[..., 0] / z
    y_src = proj[..., 1] / z

    # Nearest sampling of source depth, zeros outside.
    xi = jnp.round(x_src).astype(jnp.int32)
    yi = jnp.round(y_src).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    sampled = jnp.where(
        valid, depth_src[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)], 0.0)

    # Back-project with the sampled source depth.
    pix_src = jnp.stack([x_src, y_src, jnp.ones_like(x_src)], axis=-1)
    xyz_src2 = (pix_src @ jnp.linalg.inv(K).T) * sampled[..., None]
    rel_back = jnp.linalg.inv(T_ref) @ T_src
    xyz_back = xyz_src2 @ rel_back[:3, :3].T + rel_back[:3, 3]
    depth_reproj = xyz_back[..., 2] * (sampled > 0)
    proj_back = xyz_back @ K.T
    zb = jnp.maximum(proj_back[..., 2], 1e-10)
    return depth_reproj, proj_back[..., 0] / zb, proj_back[..., 1] / zb


def check_geometric_consistency(depth_ref, depth_src, T_ref, T_src, K,
                                thres_p_dist: float = 1.0,
                                thres_d_diff: float = 0.001):
    """Pixel-distance + relative-depth-difference consistency check
    (`check_geometric_consistency_batch`)."""
    h, w = depth_ref.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=depth_ref.dtype),
                          jnp.arange(w, dtype=depth_ref.dtype), indexing="ij")
    depth_reproj, x2d, y2d = reproject_with_depth(
        depth_ref, depth_src, T_ref, T_src, K)
    dist = jnp.sqrt((x2d - xs) ** 2 + (y2d - ys) ** 2)
    rel_diff = jnp.abs(depth_reproj - depth_ref) / jnp.maximum(depth_ref, 1e-10)
    mask = (dist < thres_p_dist) & (rel_diff < thres_d_diff)
    return mask, jnp.where(mask, depth_reproj, 0.0)


@partial(jax.jit, static_argnames=("thres_view",))
def geometric_fusion(depth_ref: jnp.ndarray, depth_srcs: jnp.ndarray,
                     T_ref: jnp.ndarray, T_srcs: jnp.ndarray,
                     K: jnp.ndarray, thres_view: int = 2) -> jnp.ndarray:
    """Fuse a reference depth with V source views (`gemo_filter_fusion`).

    depth_srcs [V,H,W]; T_srcs [V,4,4]. Pixels consistent in fewer than
    ``thres_view`` views are zeroed; the rest average the reprojections.
    """
    def one(src_depth, src_T):
        return check_geometric_consistency(
            depth_ref, src_depth, T_ref, src_T, K)

    masks, reprojs = jax.vmap(one)(depth_srcs, T_srcs)
    mask_sum = masks.astype(depth_ref.dtype).sum(axis=0)
    est_sum = reprojs.sum(axis=0)
    keep = (mask_sum - thres_view) >= 0
    fused = (est_sum + depth_ref) / (mask_sum + 1.0)
    return fused * keep


# ---------------------------------------------------------------------------
# Depth filtering + pose chaining (infer_video.py:638-666)
# ---------------------------------------------------------------------------

def filter_depth(depth: np.ndarray, grad_max: float = 0.05,
                 depth_max: float = 10.0, crop_h: int = 0,
                 crop_w: int = 0) -> np.ndarray:
    """Zero out high-gradient, far and border pixels before fusion/export."""
    depth = depth.copy()
    pad = np.pad(depth, [(0, 1), (0, 1)], "constant")
    grad = ((pad[1:, :-1] - pad[:-1, :-1]) ** 2
            + (pad[:-1, 1:] - pad[:-1, :-1]) ** 2)
    depth[grad > grad_max] = 0
    depth[depth > depth_max] = 0
    if crop_h > 0 and crop_w > 0:
        depth[:crop_h, :crop_w] = 0
        depth[-crop_h:, -crop_w:] = 0
    return depth


class TrajectoryAccumulator:
    """Chain per-triplet relative poses into a global trajectory with
    monocular scale propagation (`infer_video.py:638-666`).

    Feed (pose21, pose23) per frame: pose21 = T_{prev<-cur},
    pose23 = T_{next<-cur}. The translation of pose21 is rescaled so its
    norm matches the previous step's pose23 — the same physical motion
    seen from the other side — keeping scale consistent along the video.
    """

    def __init__(self):
        self.global_pose: Optional[np.ndarray] = None
        self.pose23_prev: Optional[np.ndarray] = None
        self.trajectory: List[np.ndarray] = []

    def add(self, pose21: np.ndarray, pose23: np.ndarray) -> np.ndarray:
        pose21 = pose21.copy()
        if self.pose23_prev is not None:
            t_prev = np.linalg.norm(self.pose23_prev[:3, 3])
            t_cur = np.linalg.norm(pose21[:3, 3])
            if t_cur > 1e-12:
                pose21[:3, 3] *= t_prev / t_cur
        self.pose23_prev = pose23
        if self.global_pose is None:
            self.global_pose = pose21
        else:
            self.global_pose = self.global_pose @ pose21
        self.trajectory.append(self.global_pose.copy())
        return self.global_pose

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump([p.tolist() for p in self.trajectory], f)
