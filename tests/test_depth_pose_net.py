"""DepthPoseNet: version parsing, shapes, losses, gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dro_sfm_tpu.models import (
    DepthPoseNet,
    SfmModelConfig,
    VersionSpec,
    forward,
    forward_and_loss,
)


def test_version_parse():
    s = VersionSpec.parse("it12-h-out")
    assert s.total_iters == 12 and s.seq_len == 4 and s.outer_iters == 3
    assert s.hidden_dim == 128 and s.out_normalize and not s.inter_sup
    assert s.num_predictions == 4

    s2 = VersionSpec.parse("it8-seq2-inter")
    assert s2.seq_len == 2 and s2.outer_iters == 4 and s2.inter_sup
    # 'h' substring check matches the reference semantics exactly
    assert s2.hidden_dim == 64
    assert s2.num_predictions == 1 + 4 * 2


def make_batch(rng, b=1, n=2, h=64, w=96):
    K = np.array([[w / 2, 0, (w - 1) / 2], [0, w / 2, (h - 1) / 2],
                  [0, 0, 1.0]], dtype=np.float32)
    return {
        "rgb": jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32),
        "rgb_context": jnp.asarray(rng.uniform(size=(b, n, h, w, 3)), jnp.float32),
        "rgb_original": jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32),
        "rgb_context_original": jnp.asarray(
            rng.uniform(size=(b, n, h, w, 3)), jnp.float32),
        "intrinsics": jnp.broadcast_to(jnp.asarray(K), (b, 3, 3)),
        "depth": jnp.asarray(rng.uniform(1.0, 9.0, size=(b, h, w, 1)), jnp.float32),
        "pose_context": jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, n, 4, 4)),
    }


@pytest.fixture(scope="module")
def net_and_vars():
    net = DepthPoseNet(version="it4-h-out", min_depth=0.1, max_depth=100.0)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    variables = net.init(jax.random.PRNGKey(0), batch["rgb"],
                         batch["rgb_context"], batch["intrinsics"], train=False)
    return net, variables, batch


def test_forward_shapes(net_and_vars):
    net, variables, batch = net_and_vars
    out = net.apply(variables, batch["rgb"], batch["rgb_context"],
                    batch["intrinsics"], train=False)
    b, n = 1, 2
    h, w = 64, 96
    p = net.spec.num_predictions  # 1 init + 1 outer iter
    assert out["inv_depths"].shape == (p, b, h, w, 1)
    assert out["pose_vecs"].shape == (b, n, p, 6)
    # The *initial* normalized prediction is a valid inverse depth in
    # (1/max, 1/min); refined predictions are unclamped (reference
    # semantics: deltas are added to the raw disp before disp_to_depth).
    inv0 = np.asarray(out["inv_depths"][0])
    assert np.all(inv0 > 1.0 / 100.0 - 1e-6) and np.all(inv0 < 1.0 / 0.1 + 1e-6)
    assert np.all(np.isfinite(np.asarray(out["inv_depths"])))
    assert np.all(np.isfinite(np.asarray(out["pose_vecs"])))


def test_last_only_matches_full_stack(net_and_vars):
    """The eval fast path (last_only=True) returns exactly the final
    prediction of the full stack — P=1 depth output, identical values."""
    net, variables, batch = net_and_vars
    args = (batch["rgb"], batch["rgb_context"], batch["intrinsics"])
    full = net.apply(variables, *args, train=False)
    fast = net.apply(variables, *args, train=False, last_only=True)
    assert fast["inv_depths"].shape[0] == 1
    np.testing.assert_allclose(np.asarray(fast["inv_depths"][-1]),
                               np.asarray(full["inv_depths"][-1]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fast["pose_vecs"]),
                               np.asarray(full["pose_vecs"]), atol=1e-6)


@pytest.mark.slow
def test_selfsup_loss_and_grads(net_and_vars):
    net, variables, batch = net_and_vars
    cfg = SfmModelConfig(name="SelfSupModelMF", version="it4-h-out")

    def loss_fn(params):
        vs = {**variables, "params": params}
        loss, _ = forward_and_loss(cfg, net, vs, batch, jax.random.PRNGKey(1))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.abs(g).max()) for g in flat]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0.0


@pytest.mark.slow
def test_sup_loss_and_grads(net_and_vars):
    net, variables, batch = net_and_vars
    cfg = SfmModelConfig(name="SupModelMF", version="it4-h-out")

    def loss_fn(params):
        vs = {**variables, "params": params}
        loss, (_, metrics, _) = forward_and_loss(
            cfg, net, vs, batch, jax.random.PRNGKey(1))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0.0
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))


@pytest.mark.slow  # re-tiered r5: >25s call (results/pytest_fast_r5_durations.log)
def test_semisup_loss(net_and_vars):
    net, variables, batch = net_and_vars
    cfg = SfmModelConfig(name="SemiSupModelMFPose", version="it4-h-out",
                         supervised_loss_weight=0.9)
    loss, (_, metrics, _) = forward_and_loss(
        cfg, net, variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "depth_loss" in metrics and "photometric_loss" in metrics


def test_eval_forward_has_no_batchstats_update(net_and_vars):
    net, variables, batch = net_and_vars
    out, updates = forward(net, variables, batch, train=False)
    assert updates == {}
    assert out["inv_depths"].shape[0] == net.spec.num_predictions
