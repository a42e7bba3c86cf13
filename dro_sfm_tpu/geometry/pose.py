"""SE(3) pose algebra as a jit-friendly pytree.

Functional equivalent of the reference's `Pose` wrapper and helpers
(`/root/reference/dro_sfm/geometry/pose.py`,
`/root/reference/dro_sfm/geometry/pose_utils.py:73-103`): batched [.., 4, 4]
rigid transforms with composition, inversion, point transforms, and
construction from 6-DoF vectors [t | r] (translation first, rotation second —
the layout produced by the network pose head).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dro_sfm_tpu.geometry import rotations


@jax.tree_util.register_pytree_node_class
class Pose:
    """A batch of rigid transforms stored as [..., 4, 4] matrices."""

    def __init__(self, mat: jnp.ndarray):
        self.mat = mat

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # -- constructors -------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Pose":
        eye = jnp.eye(4, dtype=dtype)
        return cls(jnp.broadcast_to(eye, (*batch_shape, 4, 4)))

    @classmethod
    def from_vec(cls, vec: jnp.ndarray, mode: str = "euler") -> "Pose":
        """6-DoF vectors [..., 6] = [tx ty tz rx ry rz] -> poses.

        Parity: `pose.py:39-45` + `pose_utils.py:73-85` (translation is the
        first three components).
        """
        return cls(pose_vec_to_mat(vec, mode))

    @classmethod
    def from_rt(cls, rot: jnp.ndarray, trans: jnp.ndarray) -> "Pose":
        """Rotation [..., 3, 3] + translation [..., 3] -> poses."""
        batch = jnp.broadcast_shapes(rot.shape[:-2], trans.shape[:-1])
        top = jnp.concatenate(
            [jnp.broadcast_to(rot, (*batch, 3, 3)),
             jnp.broadcast_to(trans[..., None], (*batch, 3, 1))], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), (*batch, 1, 4))
        return cls(jnp.concatenate([top, bottom], axis=-2))

    # -- accessors ----------------------------------------------------------
    @property
    def shape(self):
        return self.mat.shape

    @property
    def rotation(self) -> jnp.ndarray:
        return self.mat[..., :3, :3]

    @property
    def translation(self) -> jnp.ndarray:
        return self.mat[..., :3, 3]

    # -- algebra ------------------------------------------------------------
    def inverse(self) -> "Pose":
        return Pose(invert_pose(self.mat))

    def compose(self, other: "Pose") -> "Pose":
        """self @ other (apply `other` first, then `self`)."""
        return Pose(self.mat @ other.mat)

    def transform_points(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform points [..., N, 3] or [..., H, W, 3] (channel-last).

        Rotation and translation broadcast over the spatial dims between the
        pose batch dims and the trailing coordinate axis.
        """
        spatial = points.ndim - self.mat.ndim + 1  # number of spatial axes
        rot = self.rotation.reshape(
            *self.mat.shape[:-2], *([1] * spatial), 3, 3)
        trans = self.translation.reshape(
            *self.mat.shape[:-2], *([1] * spatial), 3)
        return jnp.einsum("...ij,...j->...i", rot, points) + trans

    def __matmul__(self, other):
        if isinstance(other, Pose):
            return self.compose(other)
        return self.transform_points(other)

    def __getitem__(self, idx) -> "Pose":
        return Pose(self.mat[idx])

    def __repr__(self):
        return f"Pose(shape={tuple(self.mat.shape)})"


# ---------------------------------------------------------------------------
# Functional helpers
# ---------------------------------------------------------------------------

def pose_vec_to_mat(vec: jnp.ndarray, mode: str = "euler") -> jnp.ndarray:
    """6-DoF vectors [..., 6] -> [..., 4, 4] transforms.

    Parity: `pose_utils.py:73-85`. vec[..., :3] is translation, vec[..., 3:]
    rotation (euler or axis-angle).
    """
    trans, rot_vec = vec[..., :3], vec[..., 3:]
    if mode == "euler":
        rot = rotations.euler_to_matrix(rot_vec)
    elif mode == "axis_angle":
        rot = rotations.axis_angle_to_matrix(rot_vec)
    else:
        raise ValueError(f"Unsupported rotation mode: {mode}")
    top = jnp.concatenate([rot, trans[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=vec.dtype), (*vec.shape[:-1], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def invert_pose(mat: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of [..., 4, 4] rigid transforms.

    Parity: `pose_utils.py:89-94` — uses R^T rather than a general inverse.
    """
    rot_t = jnp.swapaxes(mat[..., :3, :3], -2, -1)
    trans = -(rot_t @ mat[..., :3, 3:4])
    top = jnp.concatenate([rot_t, trans], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=mat.dtype), (*mat.shape[:-2], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)
