"""Image grid canvas + gif/video composition.

Rebuild of `/root/reference/dro_sfm/visualization/viz_image_grid.py:51`
(grid canvas with labels) and `img2gif.py` (animation writer).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


class ImageGrid:
    """Compose equally-sized panels into a labeled grid canvas."""

    def __init__(self, rows: int, cols: int, cell_h: int, cell_w: int,
                 pad: int = 4, background: int = 32):
        self.rows, self.cols = rows, cols
        self.cell_h, self.cell_w = cell_h, cell_w
        self.pad = pad
        h = rows * cell_h + (rows + 1) * pad
        w = cols * cell_w + (cols + 1) * pad
        self.canvas = np.full((h, w, 3), background, dtype=np.uint8)

    def set_cell(self, row: int, col: int, image: np.ndarray,
                 label: Optional[str] = None) -> None:
        import cv2
        img = image
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        if img.shape[:2] != (self.cell_h, self.cell_w):
            img = cv2.resize(img, (self.cell_w, self.cell_h))
        if label:
            img = img.copy()
            cv2.putText(img, label, (6, 18), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, (255, 255, 255), 1, cv2.LINE_AA)
        y = self.pad + row * (self.cell_h + self.pad)
        x = self.pad + col * (self.cell_w + self.pad)
        self.canvas[y:y + self.cell_h, x:x + self.cell_w] = img


def write_gif(path: str, frames: Sequence[np.ndarray], fps: int = 10) -> None:
    """Animated gif from RGB frames (`img2gif.py` parity, PIL-based)."""
    from PIL import Image
    imgs: List[Image.Image] = []
    for f in frames:
        if f.dtype != np.uint8:
            f = (np.clip(f, 0, 1) * 255).astype(np.uint8)
        imgs.append(Image.fromarray(f))
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)


def write_video(path: str, frames: Sequence[np.ndarray], fps: int = 10) -> None:
    """mp4 writer from RGB frames."""
    import cv2
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for f in frames:
        if f.dtype != np.uint8:
            f = (np.clip(f, 0, 1) * 255).astype(np.uint8)
        writer.write(f[..., ::-1])
    writer.release()


def frames_from_folder(folder: str, ext=(".png", ".jpg")) -> List[np.ndarray]:
    import cv2
    out = []
    for name in sorted(os.listdir(folder)):
        if name.lower().endswith(ext):
            out.append(cv2.imread(os.path.join(folder, name))[..., ::-1])
    return out
