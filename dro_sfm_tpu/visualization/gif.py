"""Animated-GIF export of image sequences.

Rebuild of `/root/reference/dro_sfm/visualization/img2gif.py:39-219`: turn a
folder (or list) of frames into an annotated animated GIF — the quick-share
artifact for depth/demo sequences where an mp4 is overkill. The reference
hardcodes one input layout and a Microsoft font; this version takes any
frame source, draws labels with PIL's built-in font, and optionally
downscales for size.
"""
from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence, Union

import numpy as np
from PIL import Image, ImageDraw

Frames = Union[str, Sequence[Union[str, np.ndarray, Image.Image]]]


def _to_image(frame, scale: float) -> Image.Image:
    if isinstance(frame, str):
        img = Image.open(frame).convert("RGB")
    elif isinstance(frame, Image.Image):
        img = frame.convert("RGB")
    else:
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
        img = Image.fromarray(arr).convert("RGB")
    if scale != 1.0:
        img = img.resize((max(1, int(img.width * scale)),
                          max(1, int(img.height * scale))))
    return img


def images_to_gif(frames: Frames, out_path: str, fps: float = 10.0,
                  labels: Optional[Sequence[str]] = None,
                  scale: float = 1.0, loop: int = 0) -> int:
    """Write ``frames`` as an animated GIF; returns the frame count.

    ``frames``: a glob/directory of images, or a list of paths / HxWx3
    arrays (uint8 or [0,1] float) / PIL images. ``labels`` draws one text
    tag per frame (top-left), like the reference's annotated gifs
    (`img2gif.py:104-140`).
    """
    if isinstance(frames, str):
        pattern = os.path.join(frames, "*") if os.path.isdir(frames) \
            else frames
        frames = sorted(
            p for p in glob.glob(pattern)
            if os.path.splitext(p)[1].lower() in
            (".png", ".jpg", ".jpeg", ".bmp"))
    imgs: List[Image.Image] = []
    for i, frame in enumerate(frames):
        img = _to_image(frame, scale)
        if labels is not None and i < len(labels) and labels[i]:
            draw = ImageDraw.Draw(img)
            draw.rectangle([4, 4, 10 + 7 * len(labels[i]), 22],
                           fill=(0, 0, 0))
            draw.text((8, 6), labels[i], fill=(255, 255, 64))
        imgs.append(img)
    if not imgs:
        raise ValueError(f"no frames for gif: {out_path}")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    imgs[0].save(out_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000.0 / max(fps, 0.1)), loop=loop)
    return len(imgs)
