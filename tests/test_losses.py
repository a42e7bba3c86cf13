"""Loss function properties and golden checks."""
import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.losses.photometric import (
    PhotometricLossConfig,
    multiview_photometric_loss,
    warp_context,
)
from dro_sfm_tpu.losses.supervised import (
    SupervisedLossConfig,
    supervised_depth_loss,
    supervised_depth_pose_loss,
    supervised_pose_loss,
)
from dro_sfm_tpu.geometry.pose import Pose


def make_K(b, h, w):
    K = np.array([[w * 0.8, 0, (w - 1) / 2], [0, w * 0.8, (h - 1) / 2],
                  [0, 0, 1.0]], dtype=np.float32)
    return jnp.broadcast_to(jnp.asarray(K), (b, 3, 3))


def test_identity_pose_same_image_zero_photometric(rng):
    """Context == target with identity pose reconstructs exactly, so the
    photometric term vanishes for any depth."""
    b, n, p, h, w = 2, 2, 3, 24, 32
    img = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, h, w, 3)), jnp.float32)
    ctx = jnp.broadcast_to(img[:, None], (b, n, h, w, 3))
    inv_depths = jnp.asarray(
        rng.uniform(0.1, 1.0, size=(p, b, h, w, 1)), jnp.float32)
    poses = jnp.zeros((b, n, p, 6), jnp.float32)
    cfg = PhotometricLossConfig(smooth_loss_weight=0.0, automask_loss=False)
    loss, metrics = multiview_photometric_loss(
        img, ctx, inv_depths, make_K(b, h, w), poses, cfg)
    assert float(loss) < 1e-5


def test_warp_context_identity(rng):
    b, n, p, h, w = 1, 1, 1, 16, 20
    ctx = jnp.asarray(rng.uniform(size=(b, n, h, w, 3)), jnp.float32)
    inv_depths = jnp.full((p, b, h, w, 1), 0.5, jnp.float32)
    poses = jnp.zeros((b, n, p, 6), jnp.float32)
    warped = warp_context(ctx, inv_depths, poses, make_K(b, h, w))
    np.testing.assert_allclose(np.asarray(warped[0]), np.asarray(ctx), atol=1e-4)


def test_supervised_depth_loss_zero_at_gt(rng):
    p, b, h, w = 3, 2, 16, 16
    gt_inv = jnp.asarray(rng.uniform(0.05, 1.0, size=(b, h, w, 1)), jnp.float32)
    preds = jnp.broadcast_to(gt_inv[None], (p, b, h, w, 1))
    cfg = SupervisedLossConfig(min_depth=0.5, max_depth=100.0)
    loss = supervised_depth_loss(preds, gt_inv, cfg)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


def test_supervised_depth_loss_gamma_weighting():
    """Later predictions carry more weight (γ^(P-1-p))."""
    p, b, h, w = 2, 1, 8, 8
    gt_inv = jnp.full((b, h, w, 1), 0.5, jnp.float32)
    cfg = SupervisedLossConfig(min_depth=0.1, max_depth=100.0)
    # error only in the last prediction
    preds_last = jnp.stack([gt_inv, gt_inv + 0.1])
    # error only in the first prediction
    preds_first = jnp.stack([gt_inv + 0.1, gt_inv])
    l_last = float(supervised_depth_loss(preds_last, gt_inv, cfg))
    l_first = float(supervised_depth_loss(preds_first, gt_inv, cfg))
    assert l_last > l_first
    np.testing.assert_allclose(l_first / l_last, 0.85, atol=1e-5)


def test_supervised_pose_loss_zero_at_gt(rng):
    b, n, p, h, w = 1, 2, 2, 16, 20
    gt_depth = jnp.asarray(rng.uniform(2.0, 8.0, size=(b, h, w, 1)), jnp.float32)
    vec = jnp.asarray(rng.normal(size=(b, n, 6)) * 0.05, jnp.float32)
    gt_mats = Pose.from_vec(vec, "euler").mat            # [B,N,4,4]
    pose_vecs = jnp.broadcast_to(vec[:, :, None], (b, n, p, 6))
    cfg = SupervisedLossConfig(min_depth=0.1, max_depth=100.0)
    loss = supervised_pose_loss(pose_vecs, gt_mats, gt_depth,
                                make_K(b, h, w), cfg)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_supervised_pose_loss_positive_when_wrong(rng):
    b, n, p, h, w = 1, 1, 1, 16, 20
    gt_depth = jnp.full((b, h, w, 1), 5.0, jnp.float32)
    gt_mats = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, n, 4, 4))
    pose_vecs = jnp.zeros((b, n, p, 6), jnp.float32).at[..., 0].set(0.5)
    cfg = SupervisedLossConfig()
    loss = supervised_pose_loss(pose_vecs, gt_mats, gt_depth,
                                make_K(b, h, w), cfg)
    assert float(loss) > 1e-4


def test_combined_supervised_loss_metrics(rng):
    b, n, p, h, w = 1, 2, 2, 16, 20
    gt_depth = jnp.asarray(rng.uniform(2.0, 8.0, size=(b, h, w, 1)), jnp.float32)
    inv_depths = jnp.asarray(
        rng.uniform(0.1, 0.5, size=(p, b, h, w, 1)), jnp.float32)
    pose_vecs = jnp.asarray(rng.normal(size=(b, n, p, 6)) * 0.02, jnp.float32)
    gt_mats = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, n, 4, 4))
    loss, metrics = supervised_depth_pose_loss(
        inv_depths, gt_depth, pose_vecs, gt_mats, make_K(b, h, w))
    assert set(metrics) == {"depth_loss", "pose_loss", "all_loss"}
    np.testing.assert_allclose(
        float(loss),
        float(metrics["depth_loss"]) + float(metrics["pose_loss"]), rtol=1e-6)


def test_automask_suppresses_static_pixels(rng):
    """With automask, a static scene (context == target, wrong pose) gives a
    loss bounded by the identity residual (zero)."""
    b, n, p, h, w = 1, 1, 1, 24, 32
    img = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, h, w, 3)), jnp.float32)
    ctx = img[:, None]
    inv_depths = jnp.full((p, b, h, w, 1), 0.2, jnp.float32)
    # A wrong pose makes warped != target, but identity residual is 0.
    poses = jnp.zeros((b, n, p, 6), jnp.float32).at[..., 0].set(1.0)
    cfg = PhotometricLossConfig(smooth_loss_weight=0.0, automask_loss=True)
    loss, _ = multiview_photometric_loss(
        img, ctx, inv_depths, make_K(b, h, w), poses, cfg)
    assert float(loss) < 1e-5


def test_min_reduce_spans_channels_when_ssim_off(rng):
    """With ssim_loss_weight=0 the residual stays 3-channel and the
    reference cats views along the channel axis before the min
    (`multiview_photometric_loss_mf.py:250`) — a joint minimum over views
    AND channels, not a channel mean of per-view minima."""
    from dro_sfm_tpu.losses.photometric import _photometric_residual

    b, n, h, w = 1, 2, 8, 8
    cfg = PhotometricLossConfig(ssim_loss_weight=0.0, automask_loss=False,
                                smooth_loss_weight=0.0, clip_loss=0.0)
    est = jnp.asarray(rng.uniform(size=(1, b, n, h, w, 3)), jnp.float32)
    ref = jnp.asarray(rng.uniform(size=(1, b, 1, h, w, 3)), jnp.float32)
    res = _photometric_residual(est, jnp.broadcast_to(ref, est.shape), cfg)
    assert res.shape[-1] == 3  # stays 3-channel with SSIM off

    image = np.asarray(ref[0, :, 0])
    context = np.asarray(est[0])
    inv_depths = jnp.ones((1, b, h, w, 1), jnp.float32)
    pose = jnp.zeros((b, n, 1, 6), jnp.float32)
    loss, _ = multiview_photometric_loss(
        jnp.asarray(image), jnp.asarray(context), inv_depths,
        make_K(b, h, w), pose, cfg)
    # identity pose + unit depth warp is (nearly) the identity resample:
    # expected = mean over pixels of min over (views, channels) of |diff|
    diff = np.abs(context - image[:, None]).transpose(
        0, 2, 3, 1, 4).reshape(b, h, w, -1)
    # ^ [B,N,H,W,3] -> [B,H,W,N*3]
    expected = diff.min(axis=-1).mean()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4, atol=1e-5)


def test_clip_loss_pools_statistics_over_batch(rng):
    """clip_loss thresholds use mean/std pooled over the whole
    per-(prediction, view) tensor, batch included (`:223-227`)."""
    from dro_sfm_tpu.losses.photometric import _photometric_residual

    cfg = PhotometricLossConfig(ssim_loss_weight=0.0, clip_loss=0.5)
    p, b, n, h, w = 1, 3, 1, 6, 6
    est = jnp.asarray(rng.uniform(size=(p, b, n, h, w, 3)), jnp.float32)
    ref = jnp.zeros_like(est)
    res = np.asarray(_photometric_residual(est, ref, cfg))
    raw = np.abs(np.asarray(est))
    thresh = raw.mean() + 0.5 * raw.std()  # pooled over batch too
    np.testing.assert_allclose(res, np.minimum(raw, thresh),
                               rtol=1e-5, atol=1e-6)


def test_smoothness_orientation_single_frame():
    """smooth_finest_last weights the LAST stacked prediction fully —
    the packnet-sfm convention for coarsest-first single-frame stacks."""
    from dro_sfm_tpu.losses.photometric import smoothness_loss

    rng_l = np.random.default_rng(0)
    p, b, h, w = 3, 1, 8, 8
    image = jnp.asarray(rng_l.uniform(size=(b, h, w, 3)), jnp.float32)
    rough = rng_l.uniform(size=(b, h, w, 1)).astype(np.float32)
    # only prediction k is rough; all others constant (zero smoothness)
    losses = {}
    for mode in (False, True):
        cfg = PhotometricLossConfig(smooth_finest_last=mode)
        per_k = []
        for k in range(p):
            stack = np.ones((p, b, h, w, 1), np.float32)
            stack[k] += rough
            per_k.append(float(smoothness_loss(jnp.asarray(stack), image,
                                               cfg)))
        losses[mode] = per_k
    # MF orientation: first prediction weighted most; SF: last most.
    assert losses[False][0] > losses[False][-1]
    assert losses[True][-1] > losses[True][0]
