"""ProgressiveScaling schedule parity and loss wiring
(`/root/reference/dro_sfm/losses/loss_base.py:40-77`)."""
import numpy as np
import jax.numpy as jnp

from dro_sfm_tpu.losses.progressive import progressive_scale_mask


def _ref_num_scales(threshold, num_scales, progress):
    """Literal reference schedule (`loss_base.py:25-28,45-48`)."""
    if threshold <= 0.0:
        return num_scales
    bounds = np.float32(
        [threshold * (i + 1) for i in range(num_scales - 1)] + [1.0])
    return int(num_scales - np.searchsorted(bounds, progress))


def test_schedule_parity_with_reference():
    for p in (2, 4, 5):
        for th in (0.0, 0.1, 0.25, 0.4):
            for progress in (0.0, 0.05, 0.1, 0.3, 0.5, 0.9, 1.0):
                mask = np.asarray(progressive_scale_mask(p, th, progress))
                n_ref = _ref_num_scales(th, p, progress)
                assert mask.sum() == n_ref, (p, th, progress, mask)
                # active entries are the last (finest) n — the reference
                # keeps the first n of its finest-first list.
                assert (mask[p - int(mask.sum()):] == 1.0).all()


def test_supervised_loss_masks_coarse_scales():
    from dro_sfm_tpu.losses.supervised import (
        SupervisedLossConfig, supervised_depth_loss)

    rng = np.random.default_rng(0)
    p, b, h, w = 4, 2, 16, 24
    inv_depths = jnp.asarray(rng.uniform(0.1, 0.5, (p, b, h, w, 1)),
                             jnp.float32)
    gt = jnp.asarray(rng.uniform(0.1, 0.5, (b, h, w, 1)), jnp.float32)

    cfg = SupervisedLossConfig(min_depth=0.5, max_depth=100.0, gamma=1.0,
                               progressive_scaling=0.3)
    # late in training only the finest scale contributes
    late = supervised_depth_loss(inv_depths, gt, cfg, progress=0.95)
    only_finest = supervised_depth_loss(
        inv_depths[-1:], gt,
        SupervisedLossConfig(min_depth=0.5, max_depth=100.0, gamma=1.0))
    np.testing.assert_allclose(float(late), float(only_finest), rtol=1e-6)
    # early in training all scales contribute
    early = supervised_depth_loss(inv_depths, gt, cfg, progress=0.0)
    all_scales = supervised_depth_loss(
        inv_depths, gt,
        SupervisedLossConfig(min_depth=0.5, max_depth=100.0, gamma=1.0))
    np.testing.assert_allclose(float(early), float(all_scales), rtol=1e-6)


def test_progressive_config_reaches_losses():
    from dro_sfm_tpu.training.trainer import model_config_from
    from dro_sfm_tpu.utils.config import load_config

    cfg = load_config(overrides={
        "model": {"name": "SupModel",
                  "loss": {"progressive_scaling": 0.25}}})
    mc = model_config_from(cfg)
    assert mc.supervised.progressive_scaling == 0.25
    assert mc.photometric_cfg.progressive_scaling == 0.25
