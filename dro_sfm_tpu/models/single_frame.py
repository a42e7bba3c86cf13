"""Legacy single-frame depth + pose networks (monodepth2 lineage).

Rebuild of the reference's single-frame path: `SfmModel`
(`/root/reference/dro_sfm/models/SfmModel.py:12-156`, separate depth and
pose networks) with the monodepth2-style U-Net depth decoder
(`/root/reference/dro_sfm/networks/layers/resnet/depth_decoder.py`) and
pose decoder (`pose_decoder.py`). Kept for the non-multi-frame configs the
reference supports; the multi-frame DRO path in
`dro_sfm_tpu.models.depth_pose_net` is the flagship.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dro_sfm_tpu.models.encoder import BasicBlock
from dro_sfm_tpu.ops.depth_ops import disp_to_depth  # noqa: F401 (re-export)
from dro_sfm_tpu.ops.image import resize_nearest

_conv_init = nn.initializers.he_normal()


class ResNetFeatures(nn.Module):
    """ResNet-18 feature pyramid (5 scales, monodepth2 encoder layout)."""
    num_input_images: int = 1
    layers: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        feats = []
        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=_conv_init, name="conv1")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=ura, momentum=0.9,
                                 epsilon=1e-5, name="bn1")(y))
        feats.append(y)                       # stride 2, 64ch
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for li, (blocks, width) in enumerate(zip(self.layers, widths), 1):
            for bi in range(blocks):
                strides = 2 if (li > 1 and bi == 0) else 1
                y = BasicBlock(width, strides=strides, use_running_average=ura,
                               name=f"layer{li}_block{bi}")(y)
            feats.append(y)                   # strides 4, 8, 16, 32
        return feats


class DepthDecoder(nn.Module):
    """U-Net decoder with per-scale sigmoid disparity outputs
    (`depth_decoder.py:13-62`). Returns [S][B,h_s,w_s,1] finest-first."""
    scales: Sequence[int] = (0, 1, 2, 3)
    dec_channels: Sequence[int] = (16, 32, 64, 128, 256)

    @nn.compact
    def __call__(self, feats):
        def conv_block(z, ch, name):
            z = nn.Conv(ch, (3, 3), padding=1, kernel_init=_conv_init,
                        name=name)(z)
            return nn.elu(z)

        outputs = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = conv_block(x, self.dec_channels[i], f"upconv_{i}_0")
            x = resize_nearest(x, (x.shape[-3] * 2, x.shape[-2] * 2))
            if i > 0:
                x = jnp.concatenate([x, feats[i - 1]], axis=-1)
            x = conv_block(x, self.dec_channels[i], f"upconv_{i}_1")
            if i in self.scales:
                outputs[i] = nn.sigmoid(
                    nn.Conv(1, (3, 3), padding=1, kernel_init=_conv_init,
                            name=f"dispconv_{i}")(x))
        return [outputs[s] for s in sorted(self.scales)]


class DepthResNet(nn.Module):
    """Single-frame depth net: encoder + decoder -> multi-scale inverse
    depth via disp_to_depth scaling."""
    min_depth: float = 0.1
    max_depth: float = 100.0

    @nn.compact
    def __call__(self, image, train: bool = False):
        feats = ResNetFeatures(name="encoder")(image, train=train)
        disps = DepthDecoder(name="decoder")(feats)
        return [disp_to_depth(d, self.min_depth, self.max_depth)[0]
                for d in disps]


class SingleFrameNet(nn.Module):
    """Separate depth + pose networks behind the DepthPoseNet interface.

    The reference's single-frame task path keeps `depth_net` and `pose_net`
    as distinct modules with their own optimizer parameter groups
    (`SfmModel.py:12-50`, `model_wrapper.py:160-209`). Here both live under
    one flax module (param tree roots ``depth_net`` / ``pose_net``, which
    `make_optimizer` uses for the per-group learning rates) and the output
    matches the stacked-prediction layout of the multi-frame net: the S
    decoder scales are upsampled to full resolution (reference
    ``upsample_depth_maps``, `SfmModel.py:107-116`) and stacked
    coarsest-first so ``inv_depths[-1]`` is the finest map; the single pose
    estimate is broadcast over the prediction axis.
    """
    min_depth: float = 0.1
    max_depth: float = 100.0

    @nn.compact
    def __call__(self, target, refs, intrinsics=None, train: bool = False,
                 last_only: bool = False):
        inv_depths = DepthResNet(min_depth=self.min_depth,
                                 max_depth=self.max_depth,
                                 name="depth_net")(target, train=train)
        h, w = target.shape[1], target.shape[2]
        if last_only:     # eval fast path: only the finest map is consumed
            inv_depths = inv_depths[:1]
        # finest-first list -> [S,B,H,W,1] stacked coarsest-first
        full = [resize_nearest(d, (h, w)) for d in inv_depths[::-1]]
        stacked = jnp.stack(full)
        pose = PoseResNet(name="pose_net")(target, refs, train=train)
        pose_vecs = jnp.broadcast_to(
            pose[:, :, None], (*pose.shape[:2], stacked.shape[0], 6))
        return {"inv_depths": stacked, "pose_vecs": pose_vecs}


class PoseResNet(nn.Module):
    """Single-frame pose net: shared encoder on image pairs + pose decoder
    (`pose_decoder.py:12-52`): returns [B, N, 6] with the whole vector
    scaled by 0.01 and layout [r | t] converted to the repo's [t | r]."""

    @nn.compact
    def __call__(self, target, refs, train: bool = False):
        b, n = refs.shape[0], refs.shape[1]
        pairs = jnp.concatenate(
            [jnp.broadcast_to(target[:, None], refs.shape), refs], axis=-1)
        pairs = pairs.reshape(b * n, *pairs.shape[2:])
        feats = ResNetFeatures(num_input_images=2, name="encoder")(
            pairs, train=train)
        y = nn.relu(nn.Conv(256, (1, 1), kernel_init=_conv_init,
                            name="squeeze")(feats[-1]))
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, kernel_init=_conv_init,
                            name="pose_0")(y))
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, kernel_init=_conv_init,
                            name="pose_1")(y))
        y = nn.Conv(6, (1, 1), kernel_init=_conv_init, name="pose_2")(y)
        out = 0.01 * y.mean(axis=(-3, -2))            # [B*N, 6] = [r | t]
        out = jnp.concatenate([out[..., 3:], out[..., :3]], axis=-1)  # [t|r]
        return out.reshape(b, n, 6)
