"""Serving export: StableHLO artifact roundtrip (beyond-reference
capability; see `dro_sfm_tpu/export_serving.py`)."""
import json
import os

import jax
import numpy as np
import pytest

from dro_sfm_tpu.export_serving import (
    export_serving_artifact,
    load_serving_artifact,
    serving_roundtrip_check,
)

H, W, N = 32, 48, 2


@pytest.fixture(scope="module")
def tiny_net():
    import jax.numpy as jnp
    from dro_sfm_tpu.models import DepthPoseNet
    net = DepthPoseNet(version="it4-h-out-seq2", min_depth=0.2,
                       max_depth=20.0)
    K = jnp.asarray([[W * 0.8, 0, (W - 1) / 2], [0, W * 0.8, (H - 1) / 2],
                     [0, 0, 1.0]], jnp.float32)
    variables = jax.jit(lambda r: net.init(
        r, jnp.zeros((1, H, W, 3), jnp.float32),
        jnp.zeros((1, N, H, W, 3), jnp.float32), K[None],
        train=False))(jax.random.PRNGKey(0))
    return net, variables


@pytest.mark.slow  # re-tiered r5: >25s call (results/pytest_fast_r5_durations.log)
def test_export_roundtrip_matches_live_model(tmp_path, tiny_net):
    net, variables = tiny_net
    path = export_serving_artifact(net, variables, str(tmp_path), batch=1,
                                   views=N, image_shape=(H, W),
                                   platforms=("cpu",))
    assert os.path.getsize(path) > 1000
    meta = json.load(open(tmp_path / "meta.json"))
    assert meta["signature"]["target"] == [1, H, W, 3]
    err = serving_roundtrip_check(net, variables, str(tmp_path), 1, N,
                                  (H, W))
    assert err <= 1e-4


def test_artifact_is_self_contained(tmp_path, tiny_net):
    """The artifact must run without the flax module or variables —
    deserialize + call with plain arrays only."""
    net, variables = tiny_net
    export_serving_artifact(net, variables, str(tmp_path), batch=2,
                            views=N, image_shape=(H, W), platforms=("cpu",))
    art = load_serving_artifact(str(tmp_path))
    rng = np.random.default_rng(1)
    import jax.numpy as jnp
    depth, mats = art.call(
        jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32),
        jnp.asarray(rng.uniform(size=(2, N, H, W, 3)), jnp.float32),
        jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (2, 3, 3)))
    assert depth.shape == (2, H, W) and np.isfinite(np.asarray(depth)).all()
    assert mats.shape == (2, N, 4, 4)
    # Bottom row of every pose is (0,0,0,1).
    np.testing.assert_allclose(np.asarray(mats)[:, :, 3],
                               np.broadcast_to([0, 0, 0, 1.0], (2, N, 4)),
                               atol=1e-6)


@pytest.mark.slow  # re-tiered r5: >25s call (results/pytest_fast_r5_durations.log)
def test_dynamic_batch_export(tmp_path, tiny_net):
    """One symbolic-batch artifact serves multiple batch sizes."""
    net, variables = tiny_net
    export_serving_artifact(net, variables, str(tmp_path), batch=1,
                            views=N, image_shape=(H, W), platforms=("cpu",),
                            dynamic_batch=True)
    art = load_serving_artifact(str(tmp_path))
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    for b in (1, 3):
        depth, mats = art.call(
            jnp.asarray(rng.uniform(size=(b, H, W, 3)), jnp.float32),
            jnp.asarray(rng.uniform(size=(b, N, H, W, 3)), jnp.float32),
            jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3)))
        assert depth.shape == (b, H, W)
        assert mats.shape == (b, N, 4, 4)
