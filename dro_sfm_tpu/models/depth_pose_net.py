"""DepthPoseNet — the DRO recurrent depth+pose optimizer (flax, NHWC).

TPU-native rebuild of
`/root/reference/dro_sfm/networks/depth_pose/DepthPoseNet.py`: shared feature
encoder, initial depth/pose heads, then an alternating block-coordinate
refinement where a depth ConvGRU and a pose ConvGRU descend a per-pixel
feature-metric cost (squared feature difference after warping the reference
features into the target view).

TPU-first design choices (vs. the torch original):
* context views are a tensor axis [B, N, ...]; per-view work (initial poses,
  pose GRU updates, cost evaluation) folds N into the batch so every conv
  and warp runs as one big MXU-friendly op instead of a Python loop;
* the warp is a batched gather (`dro_sfm_tpu.ops.resample`), later replaced
  by the fused Pallas warp+cost kernel on the hot path;
* predictions accumulate into stacked arrays (iteration axis first), not
  Python lists, so losses reduce over them with vectorized γ-decay weights;
* `jax.lax.stop_gradient` reproduces the detach-between-outer-iters
  truncated-BPTT semantics (`DepthPoseNet.py:155-156`).

Version strings are parsed with reference semantics (`DepthPoseNet.py:22-36`):
``it{K}`` total refinement steps, ``-h`` 128-d hidden state, ``-out``
normalized (sigmoid->disp_to_depth) depth output, ``-seq{L}`` inner sequence
length (default 4), ``-inter`` intermediate supervision of every inner step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from dro_sfm_tpu.geometry.camera import Camera, scale_intrinsics
from dro_sfm_tpu.geometry.pose import Pose
from dro_sfm_tpu.models.encoder import ResNetEncoder
from dro_sfm_tpu.models.update import (
    DepthHead,
    DepthUpdateCell,
    PoseHead,
    PoseUpdateCell,
    UpMaskNet,
)
from dro_sfm_tpu.ops.resample import bilinear_sample
from dro_sfm_tpu.ops.upsample import convex_upsample


@dataclasses.dataclass(frozen=True)
class VersionSpec:
    """Parsed network version string (`DepthPoseNet.py:22-36`)."""
    total_iters: int
    seq_len: int
    hidden_dim: int
    out_normalize: bool
    inter_sup: bool

    @property
    def outer_iters(self) -> int:
        return self.total_iters // self.seq_len

    @property
    def num_predictions(self) -> int:
        """1 (init) + per-outer-iteration collected predictions."""
        per_iter = self.seq_len if self.inter_sup else 1
        return 1 + self.outer_iters * per_iter

    @classmethod
    def parse(cls, version: str) -> "VersionSpec":
        assert "it" in version, f"bad version string: {version}"
        total_iters = int(version.split("-")[0].split("it")[1])
        seq_len = 4
        for token in version.split("-"):
            if "seq" in token:
                seq_len = int(token.split("seq")[1])
        return cls(
            total_iters=total_iters,
            seq_len=seq_len,
            hidden_dim=128 if "h" in version else 64,
            out_normalize="out" in version,
            inter_sup="inter" in version,
        )


def inv2depth(inv_depth: jnp.ndarray) -> jnp.ndarray:
    """Inverse depth -> depth; non-positive inputs map to 0
    (`utils/depth.py:102-121`)."""
    depth = 1.0 / jnp.maximum(inv_depth, 1e-6)
    return jnp.where(inv_depth <= 0.0, 0.0, depth)


def depth2inv(depth: jnp.ndarray) -> jnp.ndarray:
    """Depth -> inverse depth; non-positive inputs map to 0
    (`utils/depth.py:124-144`)."""
    inv = 1.0 / jnp.maximum(depth, 1e-6)
    return jnp.where(depth <= 0.0, 0.0, inv)


def disp_to_depth(disp: jnp.ndarray, min_depth: float, max_depth: float):
    """Monodepth2 sigmoid-output scaling
    (`networks/layers/resnet/layers.py:10-19`)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


class DepthPoseNet(nn.Module):
    """Joint recurrent depth + pose network (the DRO optimizer)."""
    version: str = "it12-h-out"
    min_depth: float = 0.1
    max_depth: float = 100.0
    feat_dim: int = 128      # foutput_dim (`DepthPoseNet.py:44`)
    feat_ratio: int = 8      # output stride of the feature net
    context_dim: int = 32    # cdim (`DepthPoseNet.py:53`)

    @property
    def spec(self) -> VersionSpec:
        return VersionSpec.parse(self.version)

    def scale_inv_depth(self, x: jnp.ndarray) -> jnp.ndarray:
        """Optionally map raw network output to bounded inverse depth."""
        if self.spec.out_normalize:
            return disp_to_depth(x, self.min_depth, self.max_depth)[0]
        return x

    # ------------------------------------------------------------------
    def _warp_cost(self, fmap1, fmaps_ref, depth, pose_vecs, K_scaled):
        """Per-pixel feature-metric cost for every view.

        fmap1 [B,h,w,C]; fmaps_ref [B,N,h,w,C]; depth [B,h,w,1];
        pose_vecs [B,N,6]; K_scaled [B,3,3] -> cost [B,N,h,w,C].

        Parity: `DepthPoseNet.py:76-96` — lift target pixels with depth,
        project into each reference camera (Tcw = pose), bilinearly sample
        the reference features (zeros padding), squared difference.
        """
        cam = Camera(K_scaled)
        world_points = cam.reconstruct(depth, frame="w")  # [B,h,w,3]
        ref_pose = Pose.from_vec(pose_vecs, "euler")       # [B,N,4,4]
        ref_cam = Camera(
            jnp.broadcast_to(K_scaled[:, None], (*pose_vecs.shape[:2], 3, 3)),
            ref_pose)
        coords = ref_cam.project(
            jnp.broadcast_to(world_points[:, None],
                             (*pose_vecs.shape[:2], *world_points.shape[1:])),
            frame="w", normalize=False)                    # [B,N,h,w,2]
        warped = bilinear_sample(fmaps_ref, coords)        # [B,N,h,w,C]
        diff = fmap1[:, None] - warped
        return diff * diff

    # ------------------------------------------------------------------
    @nn.compact
    def __call__(self, target: jnp.ndarray, refs: jnp.ndarray,
                 intrinsics: jnp.ndarray, train: bool = True) -> Dict[str, Any]:
        """target [B,H,W,3]; refs [B,N,H,W,3]; intrinsics [B,3,3].

        Returns a dict with
        ``inv_depths``: [P,B,H,W,1] full-resolution inverse-depth predictions
        (P = spec.num_predictions, last entry is the final estimate) and
        ``pose_vecs``: [B,N,P,6] per-view 6-DoF predictions
        (layout parity with `DepthPoseNet.py:200-205`).
        """
        spec = self.spec
        b, n = refs.shape[0], refs.shape[1]
        h_img, w_img = target.shape[1], target.shape[2]
        hdim, cdim = spec.hidden_dim, self.context_dim

        fnet = ResNetEncoder(out_chs=self.feat_dim, stride=self.feat_ratio,
                             name="fnet")
        cnet_depth = ResNetEncoder(out_chs=hdim + cdim, stride=self.feat_ratio,
                                   name="cnet_depth")
        cnet_pose = ResNetEncoder(out_chs=hdim + cdim, stride=self.feat_ratio,
                                  num_input_images=2, name="cnet_pose")
        depth_head = DepthHead(hidden_dim=self.feat_dim, name="depth_head")
        pose_head = PoseHead(hidden_dim=self.feat_dim, name="pose_head")
        upmask_net = UpMaskNet(hidden_dim=self.feat_dim, ratio=self.feat_ratio,
                               name="upmask_net")
        depth_cell = DepthUpdateCell(hidden_dim=hdim, context_dim=cdim,
                                     ratio=self.feat_ratio,
                                     name="update_block_depth")
        pose_cell = PoseUpdateCell(hidden_dim=hdim, context_dim=cdim,
                                   name="update_block_pose")

        def fold(x):  # [B,N,...] -> [B*N,...]
            return x.reshape(b * n, *x.shape[2:])

        def unfold(x):  # [B*N,...] -> [B,N,...]
            return x.reshape(b, n, *x.shape[1:])

        # 1) Shared feature encoding of target + refs (`:112-116`).
        all_imgs = jnp.concatenate([target[:, None], refs], axis=1)
        fmaps = fnet(all_imgs.reshape(b * (n + 1), h_img, w_img, 3), train=train)
        fmaps = fmaps.reshape(b, n + 1, *fmaps.shape[1:])
        fmap1, fmaps_ref = fmaps[:, 0], fmaps[:, 1:]
        h, w = fmap1.shape[1], fmap1.shape[2]
        assert h_img // h == self.feat_ratio

        # 2) Initial pose per view (`:118-121`) — views folded into batch.
        pair_feats = jnp.concatenate(
            [jnp.broadcast_to(fmap1[:, None], fmaps_ref.shape), fmaps_ref],
            axis=-1)
        pose_init = unfold(pose_head(fold(pair_feats)))  # [B,N,6]

        # 3) Initial depth + convex upsampling (`:123-128`).
        inv_depth_init = depth_head(fmap1, act_fn=nn.sigmoid)  # [B,h,w,1]
        up_mask = upmask_net(fmap1)
        inv_depth_up = convex_upsample(inv_depth_init, up_mask,
                                       ratio=self.feat_ratio)

        depth_preds = [self.scale_inv_depth(inv_depth_up)]
        pose_preds = [pose_init]

        # 4) Context features for the GRUs (`:132-147`).
        if spec.outer_iters > 0:
            cd = cnet_depth(target, train=train)
            hidden_d = jnp.tanh(cd[..., :hdim])
            inp_d = nn.relu(cd[..., hdim:])

            pairs = jnp.concatenate(
                [jnp.broadcast_to(target[:, None], refs.shape), refs], axis=-1)
            cp = cnet_pose(fold(pairs), train=train)
            hidden_p = jnp.tanh(cp[..., :hdim])      # [B*N,h,w,hdim]
            inp_p = nn.relu(cp[..., hdim:])

        K_scaled = scale_intrinsics(intrinsics, 1.0 / self.feat_ratio)

        # 5) Alternating refinement (`:150-197`).
        inv_depth = inv_depth_init
        poses = pose_init
        for _ in range(spec.outer_iters):
            # Truncated BPTT: cut gradients between outer iterations.
            inv_depth = jax.lax.stop_gradient(inv_depth)
            poses = jax.lax.stop_gradient(poses)
            # Pose cost uses the depth frozen at the start of this outer
            # iteration; depth cost uses the frozen poses (`:158-167`).
            depth_frozen = inv2depth(self.scale_inv_depth(inv_depth))
            poses_frozen = poses

            # -- depth GRU steps (`update.py:155-173`) --
            masks, inv_depths_seq = [], []
            for _step in range(spec.seq_len):
                cost = self._warp_cost(
                    fmap1, fmaps_ref, inv2depth(self.scale_inv_depth(inv_depth)),
                    poses_frozen, K_scaled).mean(axis=1)  # mean over views
                hidden_d, delta_d, mask = depth_cell(
                    hidden_d, inv_depth, cost, inp_d)
                inv_depth = inv_depth + delta_d
                inv_depths_seq.append(inv_depth)
                masks.append(mask)
            keep = range(spec.seq_len) if spec.inter_sup else [spec.seq_len - 1]
            for i in keep:
                up = convex_upsample(inv_depths_seq[i], masks[i],
                                     ratio=self.feat_ratio)
                depth_preds.append(self.scale_inv_depth(up))

            # -- pose GRU steps, all views in parallel (`update.py:184-199`) --
            poses_seq = []
            for _step in range(spec.seq_len):
                cost = self._warp_cost(fmap1, fmaps_ref, depth_frozen, poses,
                                       K_scaled)  # [B,N,h,w,C]
                hidden_p, delta_p = pose_cell(
                    hidden_p, fold(poses), fold(cost), inp_p)
                poses = poses + unfold(delta_p)
                poses_seq.append(poses)
            pose_preds.extend(poses_seq if spec.inter_sup else [poses_seq[-1]])

        return {
            "inv_depths": jnp.stack(depth_preds, axis=0),     # [P,B,H,W,1]
            "pose_vecs": jnp.stack(pose_preds, axis=2),       # [B,N,P,6]
        }
