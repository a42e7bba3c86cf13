"""Pallas tent-warp kernel: parity with the gather path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.ops.pallas.tent_warp import pallas_warp_cost, tent_warp
from dro_sfm_tpu.ops.resample import bilinear_sample


def test_tent_warp_matches_gather(rng):
    b, h, w, c = 2, 8, 16, 32          # h*w = 128 = one tile
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    coords = jnp.asarray(
        rng.uniform(-2.0, 18.0, size=(b, h * w, 2)), jnp.float32)
    ours = tent_warp(feat, coords, True)
    expected = bilinear_sample(
        feat, coords.reshape(b, h, w, 2)).reshape(b, h * w, c)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               atol=1e-4)


def test_tent_warp_gradients_match(rng):
    b, h, w, c = 1, 8, 16, 8
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    coords = jnp.asarray(
        rng.uniform(1.0, 12.0, size=(b, h * w, 2)), jnp.float32)

    def f_pallas(ft, co):
        return (tent_warp(ft, co, True) ** 2).sum()

    def f_gather(ft, co):
        return (bilinear_sample(ft, co.reshape(b, h, w, 2)) ** 2).sum()

    gp = jax.grad(f_pallas, argnums=(0, 1))(feat, coords)
    gg = jax.grad(f_gather, argnums=(0, 1))(feat, coords)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gg[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp[1]),
                               np.asarray(gg[1]).reshape(b, h * w, 2),
                               atol=1e-3)


def test_tent_warp_gradients_at_integer_coords(rng):
    """Regression: at exactly-integer coordinates — the near-identity
    pose regime every selfsup run starts in — the tent derivative must
    reproduce the gather path's right-sided subgradient
    (F[k+1] - F[k]), not zero. The original kernel returned zero
    coordinate gradients there, which silently killed/biased the
    cost-volume geometry gradient and exploded selfsup training at
    epoch 0 (docs/convergence_selfsup_r5.md)."""
    b, h, w, c = 1, 12, 16, 8           # h*w = 192 -> p_pad 256, 2 strips
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.broadcast_to(
        jnp.stack([gx, gy], axis=-1).reshape(1, h * w, 2), (b, h * w, 2))
    coords = jnp.pad(coords, ((0, 0), (0, 256 - h * w), (0, 0)),
                     constant_values=-10.0)
    weights = jnp.asarray(rng.normal(size=(b, 256, c)), jnp.float32)

    def f_pallas(co):
        return (tent_warp(feat, co, True) * weights).sum()

    def f_gather(co):
        s = bilinear_sample(feat, co.reshape(b, 16, 16, 2))
        return (s.reshape(b, 256, c) * weights).sum()

    gp = jax.grad(f_pallas)(coords)
    gg = jax.grad(f_gather)(coords)
    assert float(jnp.abs(gg).max()) > 1.0   # the subgradient is non-trivial
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gg), atol=1e-4)


def test_pallas_warp_cost_padding(rng):
    """Non-tile-multiple h*w pads internally and matches the reference
    cost computation."""
    from dro_sfm_tpu.models.depth_pose_net import warp_cost

    b, n, h, w, c = 1, 2, 6, 10, 16     # h*w = 60, padded to 128
    fmap1 = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    fref = jnp.asarray(rng.normal(size=(b, n, h, w, c)), jnp.float32)
    depth = jnp.asarray(rng.uniform(2, 5, size=(b, h, w, 1)), jnp.float32)
    poses = jnp.asarray(rng.normal(size=(b, n, 6)) * 0.02, jnp.float32)
    K = jnp.broadcast_to(jnp.asarray(
        [[8.0, 0, 4.5], [0, 8.0, 2.5], [0, 0, 1.0]], jnp.float32), (b, 3, 3))

    expected = warp_cost(fmap1, fref, depth, poses, K, impl="gather")

    # Recompute the coords exactly as warp_cost does, then use the kernel.
    from dro_sfm_tpu.geometry.camera import Camera
    from dro_sfm_tpu.geometry.pose import Pose
    cam = Camera(K)
    pts = cam.reconstruct(depth, frame="w")
    ref_cam = Camera(jnp.broadcast_to(K[:, None], (b, n, 3, 3)),
                     Pose.from_vec(poses, "euler"))
    coords = ref_cam.project(
        jnp.broadcast_to(pts[:, None], (b, n, h, w, 3)), "w", False)
    ours = pallas_warp_cost(fmap1, fref, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               atol=1e-4)


def test_warp_cost_gradients_match_gather(rng):
    """The fused warp-subtract VJP (d_fmap1 view-sum, negated feature
    scatter, on-chip coordinate epilogue) agrees with autodiff through the
    gather path on the full cost -> scalar pipeline."""
    from dro_sfm_tpu.geometry.camera import Camera
    from dro_sfm_tpu.geometry.pose import Pose

    b, n, h, w, c = 2, 2, 6, 10, 8
    fmap1 = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    fref = jnp.asarray(rng.normal(size=(b, n, h, w, c)), jnp.float32)
    depth = jnp.asarray(rng.uniform(2, 5, size=(b, h, w, 1)), jnp.float32)
    poses = jnp.asarray(rng.normal(size=(b, n, 6)) * 0.02, jnp.float32)
    K = jnp.broadcast_to(jnp.asarray(
        [[8.0, 0, 4.5], [0, 8.0, 2.5], [0, 0, 1.0]], jnp.float32), (b, 3, 3))
    weights = jnp.asarray(rng.normal(size=(b, n, h, w, c)), jnp.float32)

    def coords_of(d, p):
        cam = Camera(K)
        pts = cam.reconstruct(d, frame="w")
        ref_cam = Camera(jnp.broadcast_to(K[:, None], (b, n, 3, 3)),
                         Pose.from_vec(p, "euler"))
        return ref_cam.project(
            jnp.broadcast_to(pts[:, None], (b, n, h, w, 3)), "w", False)

    def loss_pallas(f1, fr, d, p):
        return jnp.sum(pallas_warp_cost(f1, fr, coords_of(d, p),
                                        interpret=True) * weights)

    def loss_gather(f1, fr, d, p):
        warped = bilinear_sample(fr, coords_of(d, p))
        return jnp.sum(jnp.square(f1[:, None] - warped) * weights)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(fmap1, fref, depth,
                                                     poses)
    gg = jax.grad(loss_gather, argnums=(0, 1, 2, 3))(fmap1, fref, depth,
                                                     poses)
    for a, b_ in zip(gp, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_warp_cost_bf16_close_to_f32(rng):
    """bf16 inputs run the fused kernel in bf16 and stay within mixed-
    precision tolerance of the f32 result."""
    b, n, h, w, c = 1, 2, 6, 10, 8
    fmap1 = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    fref = jnp.asarray(rng.normal(size=(b, n, h, w, c)), jnp.float32)
    coords = jnp.asarray(
        rng.uniform(0.0, 8.0, size=(b, n, h, w, 2)), jnp.float32)
    ref = pallas_warp_cost(fmap1, fref, coords, interpret=True)
    out = pallas_warp_cost(fmap1.astype(jnp.bfloat16),
                           fref.astype(jnp.bfloat16), coords,
                           interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=0.15, rtol=0.2)
