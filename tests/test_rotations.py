"""Rotation conversion round-trips and closed-form checks."""
import jax.numpy as jnp
import numpy as np
import pytest

from dro_sfm_tpu.geometry import rotations as R


def random_rotations(rng, n=16):
    """Uniform-ish random rotation matrices via QR."""
    a = rng.normal(size=(n, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return jnp.asarray(q, dtype=jnp.float32)


def test_euler_roundtrip(rng):
    angles = jnp.asarray(rng.uniform(-1.2, 1.2, size=(32, 3)), dtype=jnp.float32)
    mats = R.euler_to_matrix(angles)
    # Valid rotations: orthonormal, det 1
    eye = jnp.eye(3)
    np.testing.assert_allclose(mats @ jnp.swapaxes(mats, -2, -1),
                               jnp.broadcast_to(eye, mats.shape), atol=1e-5)
    back = R.matrix_to_euler(mats)
    np.testing.assert_allclose(np.asarray(back), np.asarray(angles), atol=1e-5)


def test_euler_closed_form():
    # 90 deg about z only
    ang = jnp.array([[0.0, 0.0, np.pi / 2]])
    mat = R.euler_to_matrix(ang)[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(mat), expected, atol=1e-6)


def test_axis_angle_matrix_roundtrip(rng):
    mats = random_rotations(rng)
    aa = R.matrix_to_axis_angle(mats)
    back = R.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(back), np.asarray(mats), atol=1e-5)


def test_axis_angle_small_angle():
    aa = jnp.array([[1e-8, 0.0, 0.0], [0.0, 0.0, 0.0]])
    mats = R.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(
        np.asarray(mats), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_quaternion_matrix_roundtrip(rng):
    mats = random_rotations(rng)
    q = R.matrix_to_quaternion(mats)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
    assert np.all(np.asarray(q)[:, 0] >= 0)  # standardized
    back = R.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(mats), atol=1e-5)


def test_quaternion_apply_matches_matrix(rng):
    mats = random_rotations(rng, n=8)
    q = R.matrix_to_quaternion(mats)
    pts = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
    via_q = R.quaternion_apply(q, pts)
    via_m = jnp.einsum("bij,bj->bi", mats, pts)
    np.testing.assert_allclose(np.asarray(via_q), np.asarray(via_m), atol=1e-5)


def test_rotation_6d_roundtrip(rng):
    mats = random_rotations(rng)
    d6 = R.matrix_to_rotation_6d(mats)
    back = R.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(back), np.asarray(mats), atol=1e-5)


@pytest.mark.parametrize("mode", ["euler", "axis_angle"])
def test_matches_torch_reference_convention(mode, rng):
    """Cross-check euler_to_matrix against an independent numpy composition."""
    ang = rng.uniform(-1.0, 1.0, size=(4, 3)).astype(np.float32)

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    if mode == "euler":
        ours = R.euler_to_matrix(jnp.asarray(ang))
        expected = np.stack([rx(a[0]) @ ry(a[1]) @ rz(a[2]) for a in ang])
        np.testing.assert_allclose(np.asarray(ours), expected.astype(np.float32), atol=1e-5)
    else:
        ours = R.axis_angle_to_matrix(jnp.asarray(ang))
        # Rodrigues formula oracle
        theta = np.linalg.norm(ang, axis=-1, keepdims=True)
        k = ang / theta
        K = np.zeros((4, 3, 3))
        K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
        K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
        t = theta[..., None]
        expected = np.eye(3) + np.sin(t) * K + (1 - np.cos(t)) * (K @ K)
        np.testing.assert_allclose(np.asarray(ours), expected.astype(np.float32), atol=1e-5)
