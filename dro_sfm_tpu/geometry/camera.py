"""Differentiable pinhole camera (channel-last, jit-friendly pytree).

Functional equivalent of the reference camera stack
(`/root/reference/dro_sfm/geometry/camera.py:12-194`,
`/root/reference/dro_sfm/geometry/camera_utils.py`), with the same pixel
conventions that the reference's accuracy depends on:

* unnormalized pixel grid at integer centers (0..W-1 / 0..H-1)
  (`utils/image.py:267-332`),
* intrinsics rescaling with the +0.5 pixel-center shift
  (`camera_utils.py:13-19`),
* projection clamps Z at 1e-5 and, when normalizing, maps to [-1, 1] with the
  align_corners=True convention `2*x/(W-1) - 1` (`camera.py:177-186`).

Layout is NHWC/channel-last throughout: depth [..., H, W, 1],
points [..., H, W, 3], projected coords [..., H, W, 2].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dro_sfm_tpu.geometry.pose import Pose


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel coordinate grid [H, W, 3] of (x, y, 1).

    Parity: `utils/image.py:267-332` (unnormalized branch).
    """
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij")
    return jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)


def scale_intrinsics(K: jnp.ndarray, x_scale, y_scale=None) -> jnp.ndarray:
    """Rescale [..., 3, 3] intrinsics for a resized image.

    Uses the pixel-center convention of `camera_utils.py:13-19`:
    c' = (c + 0.5) * s - 0.5.
    """
    if y_scale is None:
        y_scale = x_scale
    fx = K[..., 0, 0] * x_scale
    fy = K[..., 1, 1] * y_scale
    cx = (K[..., 0, 2] + 0.5) * x_scale - 0.5
    cy = (K[..., 1, 2] + 0.5) * y_scale - 0.5
    K = K.at[..., 0, 0].set(fx)
    K = K.at[..., 1, 1].set(fy)
    K = K.at[..., 0, 2].set(cx)
    K = K.at[..., 1, 2].set(cy)
    return K


def invert_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of [..., 3, 3] pinhole intrinsics (`camera.py:70-79`)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    Kinv = K
    Kinv = Kinv.at[..., 0, 0].set(1.0 / fx)
    Kinv = Kinv.at[..., 1, 1].set(1.0 / fy)
    Kinv = Kinv.at[..., 0, 2].set(-cx / fx)
    Kinv = Kinv.at[..., 1, 2].set(-cy / fy)
    return Kinv


@jax.tree_util.register_pytree_node_class
class Camera:
    """Pinhole camera with intrinsics K [..., 3, 3] and world->camera pose Tcw.

    `Tcw` maps world-frame points into this camera's frame, matching the
    reference (`camera.py:17-30`; identity for the target camera).
    """

    def __init__(self, K: jnp.ndarray, Tcw: Pose | None = None):
        self.K = K
        self.Tcw = Pose.identity(K.shape[:-2], dtype=K.dtype) if Tcw is None else Tcw

    def tree_flatten(self):
        return (self.K, self.Tcw), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    # ------------------------------------------------------------------
    def scaled(self, x_scale, y_scale=None) -> "Camera":
        """Camera for a rescaled image (`camera.py:83-107`)."""
        if y_scale is None:
            y_scale = x_scale
        if x_scale == 1.0 and y_scale == 1.0:
            return self
        return Camera(scale_intrinsics(self.K, x_scale, y_scale), self.Tcw)

    def reconstruct(self, depth: jnp.ndarray, frame: str = "w") -> jnp.ndarray:
        """Lift a depth map [..., H, W, 1] to 3D points [..., H, W, 3].

        Parity: `camera.py:111-147` — rays = Kinv @ [x, y, 1], scaled by
        depth, then optionally moved to the world frame via Twc.
        """
        h, w = depth.shape[-3], depth.shape[-2]
        grid = pixel_grid(h, w, dtype=depth.dtype)  # [H, W, 3]
        Kinv = invert_intrinsics(self.K)  # [..., 3, 3]
        rays = jnp.einsum("...ij,hwj->...hwi", Kinv, grid)
        points_cam = rays * depth  # [..., H, W, 3]
        if frame == "c":
            return points_cam
        if frame == "w":
            return self.Tcw.inverse().transform_points(points_cam)
        raise ValueError(f"Unknown reference frame {frame}")

    def project(self, points: jnp.ndarray, frame: str = "w",
                normalize: bool = True) -> jnp.ndarray:
        """Project 3D points [..., H, W, 3] to 2D coords [..., H, W, 2].

        With ``normalize=True`` returns coords in [-1, 1] using the
        align_corners convention (`camera.py:177-186`); otherwise pixel
        coordinates. Z is clamped at 1e-5 so points behind the camera land
        far outside the image and sample to zero.
        """
        h, w = points.shape[-3], points.shape[-2]
        if frame == "w":
            points = self.Tcw.transform_points(points)
        elif frame != "c":
            raise ValueError(f"Unknown reference frame {frame}")
        proj = jnp.einsum(
            "...ij,...hwj->...hwi",
            self.K.reshape(*self.K.shape[:-2], 3, 3), points)
        x, y = proj[..., 0], proj[..., 1]
        z = jnp.maximum(proj[..., 2], 1e-5)
        u = x / z
        v = y / z
        if normalize:
            u = 2.0 * u / (w - 1) - 1.0
            v = 2.0 * v / (h - 1) - 1.0
        return jnp.stack([u, v], axis=-1)


def view_synthesis_coords(depth: jnp.ndarray, cam: Camera, ref_cam: Camera,
                          normalize: bool = False) -> jnp.ndarray:
    """Pixel coords in the reference view for each target pixel.

    The reconstruct->project composition from `camera_utils.py:23-56` /
    `DepthPoseNet.py:86-92`, shared by view synthesis and cost evaluation.
    """
    world_points = cam.reconstruct(depth, frame="w")
    return ref_cam.project(world_points, frame="w", normalize=normalize)
