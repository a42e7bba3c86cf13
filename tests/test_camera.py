"""Camera / pose geometry: round-trips and convention parity."""
import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.geometry import Camera, Pose, pixel_grid, scale_intrinsics
from dro_sfm_tpu.geometry.camera import invert_intrinsics, view_synthesis_coords


def make_K(b=2, fx=100.0, fy=110.0, cx=31.5, cy=23.5):
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], dtype=jnp.float32)
    return jnp.broadcast_to(K, (b, 3, 3))


def test_invert_intrinsics():
    K = make_K()
    Kinv = invert_intrinsics(K)
    np.testing.assert_allclose(
        np.asarray(K @ Kinv), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5)


def test_pixel_grid():
    g = pixel_grid(3, 4)
    assert g.shape == (3, 4, 3)
    np.testing.assert_allclose(np.asarray(g[1, 2]), [2.0, 1.0, 1.0])


def test_scale_intrinsics_pixel_center():
    """+0.5 pixel-center convention (camera_utils.py:13-19)."""
    K = make_K(b=1)
    K2 = scale_intrinsics(K, 0.5, 0.5)
    np.testing.assert_allclose(float(K2[0, 0, 0]), 50.0)
    np.testing.assert_allclose(float(K2[0, 0, 2]), (31.5 + 0.5) * 0.5 - 0.5)


def test_reconstruct_project_roundtrip(rng):
    b, h, w = 2, 16, 24
    K = make_K(b, cx=(w - 1) / 2, cy=(h - 1) / 2)
    depth = jnp.asarray(
        rng.uniform(1.0, 10.0, size=(b, h, w, 1)), dtype=jnp.float32)
    cam = Camera(K)
    pts = cam.reconstruct(depth, frame="w")
    coords = cam.project(pts, frame="w", normalize=False)
    grid = pixel_grid(h, w)[..., :2]
    np.testing.assert_allclose(
        np.asarray(coords), np.broadcast_to(np.asarray(grid), (b, h, w, 2)),
        atol=1e-3)


def test_reconstruct_project_cross_camera(rng):
    """Project through a second camera with a known pose: identity pose and
    identical intrinsics must reproduce the grid; a pure x-translation must
    shift u by fx*tx/Z."""
    b, h, w = 1, 8, 8
    K = make_K(b, fx=50.0, fy=50.0, cx=3.5, cy=3.5)
    depth = jnp.full((b, h, w, 1), 5.0, dtype=jnp.float32)
    cam = Camera(K)
    # Reference camera translated by tx=+1 in its own frame: Tcw maps world->ref.
    Tcw = Pose.from_rt(jnp.eye(3), jnp.array([[1.0, 0.0, 0.0]]))
    ref_cam = Camera(K, Tcw)
    coords = view_synthesis_coords(depth, cam, ref_cam, normalize=False)
    grid = pixel_grid(h, w)[..., :2]
    expected_u = np.asarray(grid[..., 0]) + 50.0 * 1.0 / 5.0
    np.testing.assert_allclose(np.asarray(coords[0, ..., 0]), expected_u, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(coords[0, ..., 1]), np.asarray(grid[..., 1]), atol=1e-4)


def test_normalized_projection_range():
    b, h, w = 1, 10, 20
    K = make_K(b, cx=(w - 1) / 2, cy=(h - 1) / 2)
    depth = jnp.ones((b, h, w, 1), dtype=jnp.float32)
    cam = Camera(K)
    pts = cam.reconstruct(depth)
    coords = cam.project(pts, normalize=True)
    np.testing.assert_allclose(float(coords[0, 0, 0, 0]), -1.0, atol=1e-5)
    np.testing.assert_allclose(float(coords[0, -1, -1, 0]), 1.0, atol=1e-5)


def test_pose_compose_inverse(rng):
    vec = jnp.asarray(rng.normal(size=(4, 6)) * 0.3, dtype=jnp.float32)
    p = Pose.from_vec(vec, "euler")
    pinv = p.inverse()
    eye = (p @ pinv).mat
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)


def test_pose_transform_points_matches_matmul(rng):
    vec = jnp.asarray(rng.normal(size=(2, 6)) * 0.3, dtype=jnp.float32)
    p = Pose.from_vec(vec, "euler")
    pts = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), dtype=jnp.float32)
    out = p.transform_points(pts)
    # homogeneous oracle
    ptsh = np.concatenate([np.asarray(pts), np.ones((2, 4, 4, 1))], axis=-1)
    expected = np.einsum("bij,bhwj->bhwi", np.asarray(p.mat), ptsh)[..., :3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_pose_vec_translation_first():
    """The 6-DoF layout is [t | r] (pose_utils.py:73-85)."""
    vec = jnp.array([[1.0, 2.0, 3.0, 0.0, 0.0, 0.0]])
    p = Pose.from_vec(vec, "euler")
    np.testing.assert_allclose(np.asarray(p.translation[0]), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(p.rotation[0]), np.eye(3), atol=1e-6)
