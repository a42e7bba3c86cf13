"""Rotation representation conversions (pure jnp, batched, jit-safe).

Covers the conversion library the reference vendors from pytorch3d
(`/root/reference/dro_sfm/geometry/pose_trans.py`) plus the bespoke
euler conventions used by its pose head
(`/root/reference/dro_sfm/geometry/pose_utils.py:7-69`).

All functions are shape-polymorphic over leading batch dims and contain no
Python control flow on traced values, so they compose with jit/vmap/scan.
"""
from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Euler (reference convention: R = Rx @ Ry @ Rz, used by the pose head)
# ---------------------------------------------------------------------------

def euler_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """Euler angles [..., 3] (x, y, z) -> rotation matrices [..., 3, 3].

    Matches the composition order of the reference pose head
    (`pose_utils.py:40-69`): R = Rx @ Ry @ Rz.
    """
    x, y, z = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)

    rx = _stack33(one, zero, zero,
                  zero, cx, -sx,
                  zero, sx, cx)
    ry = _stack33(cy, zero, sy,
                  zero, one, zero,
                  -sy, zero, cy)
    rz = _stack33(cz, -sz, zero,
                  sz, cz, zero,
                  zero, zero, one)
    return rx @ ry @ rz


def matrix_to_euler(mat: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> euler angles [..., 3] (x, y, z).

    Inverse of :func:`euler_to_matrix`; mirrors `pose_utils.py:7-35` with the
    gimbal-lock fallback expressed as a branchless `where`.
    """
    r11 = mat[..., 0, 0]
    r12 = mat[..., 0, 1]
    r13 = mat[..., 0, 2]
    r21 = mat[..., 1, 0]
    r22 = mat[..., 1, 1]
    r23 = mat[..., 1, 2]
    r33 = mat[..., 2, 2]
    cy = jnp.sqrt(r33 * r33 + r23 * r23)
    safe = cy > eps
    ex = jnp.where(safe, jnp.arctan2(-r23, r33), 0.0)
    ey = jnp.arctan2(r13, cy)
    ez = jnp.where(safe, jnp.arctan2(-r12, r11), jnp.arctan2(r21, r22))
    return jnp.stack([ex, ey, ez], axis=-1)


# ---------------------------------------------------------------------------
# Axis-angle
# ---------------------------------------------------------------------------

def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3] (via quaternions).

    Parity: `pose_trans.py:427-444` (axis_angle -> quaternion -> matrix).
    """
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(mat: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> axis-angle [..., 3]."""
    return quaternion_to_axis_angle(matrix_to_quaternion(mat))


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> unit quaternions [..., 4] (w, x, y, z).

    Uses the Taylor fallback for tiny angles like `pose_trans.py:449-481`.
    """
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angle * 0.5
    small = jnp.abs(angle) < 1e-6
    # sin(half)/angle, with series (0.5 - angle^2/48) near zero
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions [..., 4] (w, x, y, z) -> axis-angle [..., 3]."""
    norm = jnp.linalg.norm(quat[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norm, quat[..., :1])
    angle = 2.0 * half
    small = jnp.abs(angle) < 1e-6
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    return quat[..., 1:] / sin_half_over_angle


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z — scalar first, as in the reference's pose_trans)
# ---------------------------------------------------------------------------

def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions [..., 4] (w, x, y, z) -> rotation matrices [..., 3, 3].

    Parity: `pose_trans.py:22-44`.
    """
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    two_s = 2.0 / jnp.sum(quat * quat, axis=-1)
    return _stack33(
        1 - two_s * (y * y + z * z), two_s * (x * y - z * w), two_s * (x * z + y * w),
        two_s * (x * y + z * w), 1 - two_s * (x * x + z * z), two_s * (y * z - x * w),
        two_s * (x * z - y * w), two_s * (y * z + x * w), 1 - two_s * (x * x + y * y),
    )


def matrix_to_quaternion(mat: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> unit quaternions [..., 4] (w, x, y, z).

    Branchless Shepperd-style selection of the numerically best of the four
    candidate quaternions (parity with `pose_trans.py:76-117`).
    """
    m00 = mat[..., 0, 0]
    m11 = mat[..., 1, 1]
    m22 = mat[..., 2, 2]
    m21 = mat[..., 2, 1]
    m12 = mat[..., 1, 2]
    m02 = mat[..., 0, 2]
    m20 = mat[..., 2, 0]
    m10 = mat[..., 1, 0]
    m01 = mat[..., 0, 1]

    # Squared magnitudes of (w, x, y, z), clipped at zero.
    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    # Candidate quaternions, one per pivot component.
    cand_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4, 4]

    denom = 2.0 * jnp.maximum(q_abs, 0.1)[..., None]
    cands = cands / denom

    best = jnp.argmax(q_abs_sq, axis=-1)
    quat = jnp.take_along_axis(
        cands, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    return standardize_quaternion(quat / jnp.linalg.norm(quat, axis=-1, keepdims=True))


def standardize_quaternion(quat: jnp.ndarray) -> jnp.ndarray:
    """Force a non-negative real part (`pose_trans.py:60-73`)."""
    return jnp.where(quat[..., :1] < 0, -quat, quat)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions [..., 4] (w, x, y, z), unnormalized
    sign (`pose_trans.py:346-365`)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product with a standardized (non-negative real part) result
    (`pose_trans.py:368-383`)."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(quat: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of unit quaternions [..., 4]."""
    return quat * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=quat.dtype)


def quaternion_apply(quat: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate points [..., 3] by unit quaternions [..., 4]
    (`pose_trans.py:403-424`: raw products — standardizing mid-chain would
    flip the intermediate's vector part)."""
    zeros = jnp.zeros_like(point[..., :1])
    p = jnp.concatenate([zeros, point], axis=-1)
    out = quaternion_raw_multiply(quaternion_raw_multiply(quat, p),
                                  quaternion_invert(quat))
    return out[..., 1:]


# ---------------------------------------------------------------------------
# Arbitrary euler conventions (parity: pose_trans.py:122-258)
# ---------------------------------------------------------------------------

_AXIS_INDEX = {"X": 0, "Y": 1, "Z": 2}


def _validate_convention(convention: str) -> None:
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    for letter in convention:
        if letter not in _AXIS_INDEX:
            raise ValueError(f"Invalid letter {letter} in convention string.")


def _single_axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation about one coordinate axis; angle [...] -> [..., 3, 3]."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        return _stack33(one, zero, zero, zero, c, -s, zero, s, c)
    if axis == "Y":
        return _stack33(c, zero, s, zero, one, zero, -s, zero, c)
    return _stack33(c, -s, zero, s, c, zero, zero, zero, one)


def euler_angles_to_matrix(euler_angles: jnp.ndarray,
                           convention: str) -> jnp.ndarray:
    """Euler angles [..., 3] under any 3-letter convention -> [..., 3, 3].

    `angles[..., i]` rotates about axis `convention[i]`; the matrices
    compose left-to-right (R = R0 @ R1 @ R2), matching
    `pose_trans.py:150-173`. `convention` is static (Python string), so the
    function stays jittable per convention.
    """
    _validate_convention(convention)
    if euler_angles.shape[-1] != 3:
        raise ValueError("Invalid input euler angles.")
    r0 = _single_axis_rotation(convention[0], euler_angles[..., 0])
    r1 = _single_axis_rotation(convention[1], euler_angles[..., 1])
    r2 = _single_axis_rotation(convention[2], euler_angles[..., 2])
    return r0 @ r1 @ r2


def _angle_from_tan(axis: str, other_axis: str, data: jnp.ndarray,
                    horizontal: bool, tait_bryan: bool) -> jnp.ndarray:
    """First/third euler angle from the matrix entries that are constant
    multiples of its sine and cosine (`pose_trans.py:176-206`)."""
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(mat: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> euler angles [..., 3] under any
    3-letter convention (`pose_trans.py:218-258`). Inverse of
    :func:`euler_angles_to_matrix` away from gimbal lock."""
    _validate_convention(convention)
    if mat.shape[-2:] != (3, 3):
        raise ValueError(f"Invalid rotation matrix shape {mat.shape}.")
    i0 = _AXIS_INDEX[convention[0]]
    i2 = _AXIS_INDEX[convention[2]]
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(mat[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0),
                     -1.0, 1.0))
    else:
        central = jnp.arccos(jnp.clip(mat[..., i0, i0], -1.0, 1.0))
    first = _angle_from_tan(convention[0], convention[1], mat[..., i2],
                            False, tait_bryan)
    third = _angle_from_tan(convention[2], convention[1], mat[..., i0, :],
                            True, tait_bryan)
    return jnp.stack([first, central, third], axis=-1)


# ---------------------------------------------------------------------------
# Random rotations (parity: pose_trans.py:261-327; jax-idiomatic explicit
# PRNG keys instead of the global torch generator)
# ---------------------------------------------------------------------------

def random_quaternions(key, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n, 4] uniform random unit quaternions with non-negative real part."""
    import jax
    o = jax.random.normal(key, (n, 4), dtype)
    norm = jnp.sqrt(jnp.sum(o * o, axis=1))
    signed = jnp.where(o[:, 0] < 0, -norm, norm)
    return o / signed[:, None]


def random_rotations(key, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n, 3, 3] uniform random rotation matrices."""
    return quaternion_to_matrix(random_quaternions(key, n, dtype))


def random_rotation(key, dtype=jnp.float32) -> jnp.ndarray:
    """A single [3, 3] uniform random rotation matrix."""
    return random_rotations(key, 1, dtype)[0]


# ---------------------------------------------------------------------------
# Continuous 6D representation (Zhou et al., parity: pose_trans.py:484-520)
# ---------------------------------------------------------------------------

def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation [..., 6] -> matrices [..., 3, 3]."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(mat: jnp.ndarray) -> jnp.ndarray:
    """Matrices [..., 3, 3] -> 6D representation [..., 6] (first two rows)."""
    return mat[..., :2, :].reshape(*mat.shape[:-2], 6)


# ---------------------------------------------------------------------------

def _stack33(*elems: jnp.ndarray) -> jnp.ndarray:
    """Stack nine [...]-shaped arrays into [..., 3, 3]."""
    assert len(elems) == 9
    rows = [jnp.stack(elems[i * 3:(i + 1) * 3], axis=-1) for i in range(3)]
    return jnp.stack(rows, axis=-2)
