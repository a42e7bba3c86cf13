"""ResNet-18 feature extractor with FPN-style upconv fusion (flax, NHWC).

TPU-native rebuild of the reference's truncated-ResNet encoder
(`/root/reference/dro_sfm/networks/optim/extractor.py:7-107`): conv1/2 +
maxpool + layers1-3 (stride 16), then bilinear x2 upsampling fused with the
stride-8 (and optionally stride-4) skip features, projected to ``out_chs``.

Differences from the torch original, by design:
* channel-last layout and `nn.Conv` (XLA tiles these onto the MXU directly);
* BatchNorm statistics reduce over the *global* batch when the batch axis is
  sharded over the device mesh (GSPMD makes the mean/var reductions global),
  which replaces torch's unsynced per-GPU BN;
* multi-image inputs are an explicit leading view axis folded into batch by
  the caller, never a Python list.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from dro_sfm_tpu.ops.image import resize_bilinear

_conv_init = nn.initializers.he_normal()


class BasicBlock(nn.Module):
    """ResNet-18/34 basic residual block (3x3 + 3x3, optional downsample)."""
    features: int
    strides: int = 1
    use_running_average: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=self.use_running_average,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, kernel_init=_conv_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """Truncated ResNet-18 with upconv fusion to stride 8 or 4.

    Args mirror the reference (`extractor.py:11`): ``num_input_images`` scales
    the first conv's input channels, ``out_chs`` the output feature width,
    ``stride`` the output stride (8 or 4).
    """
    out_chs: int = 32
    stride: int = 8
    num_input_images: int = 1
    layers: Sequence[int] = (2, 2, 2)  # blocks in layer1..layer3 (resnet18)
    dtype: Any = jnp.float32  # compute dtype (bfloat16 for MXU speed)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_trunk: bool = False) -> jnp.ndarray:
        """x: [B, H, W, 3 * num_input_images] -> [B, H/stride, W/stride, out_chs].

        ``return_trunk`` short-circuits after layer3 (stride 16) — used by
        weight-conversion parity tests against torchvision.
        """
        if self.stride not in (8, 4):
            raise NotImplementedError(f"stride {self.stride}")
        ura = not train
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=ura, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype,
                    name="conv1")(x.astype(self.dtype))
        y = nn.relu(norm("bn1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        widths = (64, 128, 256)
        for li, (blocks, width) in enumerate(zip(self.layers, widths), start=1):
            for bi in range(blocks):
                strides = 2 if (li > 1 and bi == 0) else 1
                y = BasicBlock(width, strides=strides, use_running_average=ura,
                               dtype=self.dtype, name=f"layer{li}_block{bi}")(y)
            feats[f"s{4 * 2 ** (li - 1)}"] = y

        if return_trunk:
            return y

        def upconv(z, features, name):
            z = nn.Conv(features, (3, 3), padding=1, kernel_init=_conv_init,
                        dtype=self.dtype, name=name)(z)
            return nn.relu(z)

        # stride 16 -> 8 (extractor.py:87-91)
        y = resize_bilinear(
            y, (y.shape[-3] * 2, y.shape[-2] * 2), align_corners=False)
        y = upconv(y, 128, "upconv1")
        y = upconv(jnp.concatenate([y, feats["s8"]], axis=-1), 128,
                   "upconv1_fusion")
        if self.stride == 4:  # 8 -> 4 (extractor.py:93-101)
            y = resize_bilinear(
                y, (y.shape[-3] * 2, y.shape[-2] * 2), align_corners=False)
            y = upconv(y, 64, "upconv2")
            y = upconv(jnp.concatenate([y, feats["s4"]], axis=-1), 64,
                       "upconv2_fusion")
        return nn.Conv(self.out_chs, (3, 3), padding=1, kernel_init=_conv_init,
                       dtype=self.dtype, name="out_conv")(y)
