"""Sample transforms: resize, duplicate-originals, color jitter (numpy/cv2).

Numpy rebuild of `/root/reference/dro_sfm/datasets/{transforms,augmentations}.py`:

* train: resize(rgb+depth+intrinsics) -> duplicate originals -> jitter ->
  float arrays (`transforms.py:7-31`)
* validation/test: resize(rgb+intrinsics) -> float arrays
  (`transforms.py:33-86`)

Intrinsics rescale at this level is the plain out/in multiply the reference
dataloader uses (`augmentations.py:96-105`), distinct from the camera's
+0.5-center convention. Depth resizes with nearest (`augmentations.py:49-66`).
Color jitter follows torchvision ColorJitter semantics (uniform factors in
[max(0, 1-x), 1+x], hue in [-h, h]) applied in fixed b/c/s/h order.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

from dro_sfm_tpu.data.base import Sample


def _resize_rgb(img: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    if img.shape[:2] == tuple(shape):
        return img
    return cv2.resize(img, (shape[1], shape[0]), interpolation=cv2.INTER_LINEAR)


def _resize_depth(depth: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    if depth.shape[:2] == tuple(shape):
        return depth
    out = cv2.resize(depth[..., 0], (shape[1], shape[0]),
                     interpolation=cv2.INTER_NEAREST)
    return out[..., None]


def resize_sample(sample: Sample, shape: Tuple[int, int],
                  with_depth: bool = True) -> Sample:
    """Resize images (+ depth for training) and rescale intrinsics."""
    h, w = sample["rgb"].shape[:2]
    out_h, out_w = shape
    if (h, w) != (out_h, out_w):
        K = sample["intrinsics"].copy()
        K[0] *= out_w / w
        K[1] *= out_h / h
        sample["intrinsics"] = K
        sample["rgb"] = _resize_rgb(sample["rgb"], shape)
        sample["rgb_context"] = np.stack(
            [_resize_rgb(im, shape) for im in sample["rgb_context"]])
        if with_depth and "depth" in sample:
            sample["depth"] = _resize_depth(sample["depth"], shape)
    return sample


def duplicate_sample(sample: Sample) -> Sample:
    """Keep pre-jitter copies (`augmentations.py` duplicate_sample).

    Originals are stored as float regardless of the working dtype (the
    photometric loss consumes them directly)."""
    rgb = sample["rgb"]
    sample["rgb_original"] = (_to_float_rgb(rgb) if rgb.dtype == np.uint8
                              else rgb.copy())
    ctx = sample["rgb_context"]
    sample["rgb_context_original"] = (_to_float_rgb(ctx)
                                      if ctx.dtype == np.uint8
                                      else ctx.copy())
    return sample


def _to_float_rgb(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [0,1]; float input passes through.

    Conversion deliberately happens AFTER the resize (datasets decode and
    resize in uint8 — 1/4 the bytes through cv2.resize and a ~2.5x smaller
    astype; the reference pipeline equally resizes uint8 PIL images,
    `augmentations.py:30-46`)."""
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return np.asarray(img, np.float32)


def float_sample(sample: Sample) -> Sample:
    sample["rgb"] = _to_float_rgb(sample["rgb"])
    sample["rgb_context"] = _to_float_rgb(sample["rgb_context"])
    return sample


def _jitter_once(img: np.ndarray, b: float, c: float, s: float,
                 h: float) -> np.ndarray:
    """Apply brightness/contrast/saturation/hue factors to [H,W,3] in [0,1]."""
    out = np.clip(img * b, 0.0, 1.0)
    mean = float(out.mean())
    # One fused affine pass: (out - mean) * c + mean.
    out = np.clip(out * c + mean * (1.0 - c), 0.0, 1.0)
    # cv2's RGB2GRAY uses the same 0.299/0.587/0.114 weights and releases
    # the GIL (this transform runs inside loader worker threads).
    gray = cv2.cvtColor(out.astype(np.float32, copy=False),
                        cv2.COLOR_RGB2GRAY)[..., None]
    out = np.clip(out * s + gray * (1.0 - s), 0.0, 1.0)
    if h != 0.0:
        hsv = cv2.cvtColor(out.astype(np.float32), cv2.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
        out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return np.clip(out, 0.0, 1.0)


def _jitter_once_u8(img: np.ndarray, b: float, c: float, s: float,
                    h: float) -> np.ndarray:
    """uint8 jitter via cv2 LUTs / saturating arithmetic.

    Same factor semantics as :func:`_jitter_once` quantized to uint8 steps
    — which is what the reference's torchvision ColorJitter does on PIL
    images anyway. Every per-pixel pass is a GIL-releasing cv2 call, which
    is what lets the thread-pool loader actually scale."""
    lut = np.arange(256, dtype=np.float32)
    out = cv2.LUT(img, np.clip(lut * b, 0, 255).astype(np.uint8))
    mean = float(sum(cv2.mean(out)[:3]) / 3.0)
    out = cv2.LUT(out, np.clip(lut * c + mean * (1.0 - c), 0,
                               255).astype(np.uint8))
    gray = cv2.cvtColor(out, cv2.COLOR_RGB2GRAY)
    out = cv2.addWeighted(out, s,
                          cv2.cvtColor(gray, cv2.COLOR_GRAY2RGB), 1.0 - s,
                          0.0)
    if h != 0.0:
        hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)  # H in 2-degree units
        shift = int(round(h * 180.0)) % 180
        hlut = ((np.arange(256) + shift) % 180).astype(np.uint8)
        hsv[..., 0] = cv2.LUT(hsv[..., 0], hlut)
        out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return out


def colorjitter_sample(sample: Sample, jitter: Sequence[float],
                       rng: np.random.Generator) -> Sample:
    """Shared random color jitter for target + context (not the originals)."""
    brightness, contrast, saturation, hue = jitter
    b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    s = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
    h = rng.uniform(-hue, hue)
    fn = (_jitter_once_u8 if sample["rgb"].dtype == np.uint8
          else _jitter_once)
    sample["rgb"] = fn(sample["rgb"], b, c, s, h)
    sample["rgb_context"] = np.stack(
        [fn(im, b, c, s, h) for im in sample["rgb_context"]])
    return sample


def train_transform(sample: Sample, image_shape: Tuple[int, int],
                    jittering: Sequence[float],
                    rng: Optional[np.random.Generator] = None) -> Sample:
    """Training pipeline (`transforms.py:7-31`)."""
    if image_shape:
        sample = resize_sample(sample, image_shape, with_depth=True)
    sample = duplicate_sample(sample)
    if jittering and rng is not None:
        sample = colorjitter_sample(sample, jittering, rng)
    return float_sample(sample)


def eval_transform(sample: Sample, image_shape: Tuple[int, int]) -> Sample:
    """Validation/test pipeline: images+intrinsics resize only, GT depth
    stays at full resolution for metric evaluation (`transforms.py:33-86`)."""
    if image_shape:
        sample = resize_sample(sample, image_shape, with_depth=False)
    return float_sample(sample)
