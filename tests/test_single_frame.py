"""Legacy single-frame networks + PercepNet: shapes and sanity."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow  # re-tiered r5: >25s call (results/pytest_fast_r5_durations.log)
def test_depth_resnet_scales(rng):
    from dro_sfm_tpu.models.single_frame import DepthResNet
    net = DepthResNet(min_depth=0.5, max_depth=50.0)
    x = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    disps = net.apply(variables, x, train=False)
    assert len(disps) == 4
    assert disps[0].shape == (1, 64, 96, 1)      # full res
    assert disps[1].shape == (1, 32, 48, 1)
    assert disps[3].shape == (1, 8, 12, 1)
    for d in disps:
        v = np.asarray(d)
        assert np.all(v > 1 / 50.0 - 1e-6) and np.all(v < 1 / 0.5 + 1e-6)


def test_pose_resnet(rng):
    from dro_sfm_tpu.models.single_frame import PoseResNet
    net = PoseResNet()
    t = jnp.asarray(rng.uniform(size=(2, 64, 96, 3)), jnp.float32)
    refs = jnp.asarray(rng.uniform(size=(2, 2, 64, 96, 3)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), t, refs, train=False)
    out = net.apply(variables, t, refs, train=False)
    assert out.shape == (2, 2, 6)
    assert np.all(np.abs(np.asarray(out)) < 1.0)  # 0.01-scaled


def test_percep_net(rng):
    from dro_sfm_tpu.models.percep import PercepNet
    net = PercepNet(resize=False)
    a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), a, b)
    d_ab = net.apply(variables, a, b)
    d_aa = net.apply(variables, a, a)
    assert d_ab.shape == (1, 64, 64, 1)
    assert float(jnp.abs(d_aa).max()) < 1e-6     # identical images -> 0
    assert float(d_ab.mean()) > 0.0
