"""Pretrained-encoder grafting + partial checkpoint loading."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flax import serialization

from dro_sfm_tpu.models.depth_pose_net import DepthPoseNet
from dro_sfm_tpu.training.init_weights import (
    graft_pretrained_encoders,
    load_partial_network,
)


@pytest.fixture(scope="module")
def small_vars():
    net = DepthPoseNet(version="it2-seq2-h-out")
    rng = np.random.default_rng(0)
    v = net.init(jax.random.PRNGKey(0),
                 jnp.asarray(rng.uniform(size=(1, 32, 48, 3)), jnp.float32),
                 jnp.asarray(rng.uniform(size=(1, 2, 32, 48, 3)), jnp.float32),
                 jnp.asarray(np.eye(3, dtype=np.float32)[None]), train=False)
    return net, v


def _trunk_tree(seed=1):
    """A converted resnet18 trunk tree with recognizable values."""
    torch = pytest.importorskip("torch")
    from tests.reference_shim import _fake_resnet18_state_dict
    from tools.convert_torch_weights import convert_resnet18_encoder
    sd = {k: v.numpy() for k, v in _fake_resnet18_state_dict(seed).items()
          if "num_batches" not in k}
    return convert_resnet18_encoder(sd), sd


def test_graft_pretrained_encoders(small_vars):
    """All three encoder trunks adopt the converted weights; cnet_pose conv1
    is replicated /2 (`extractor.py:57-58`); FPN heads keep fresh init."""
    net, variables = small_vars
    trunk, sd = _trunk_tree()
    out = graft_pretrained_encoders(variables, trunk, verbose=False)

    w_src = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    for enc in ("fnet", "cnet_depth"):
        np.testing.assert_allclose(out["params"][enc]["conv1"]["kernel"],
                                   w_src)
        np.testing.assert_allclose(
            out["params"][enc]["layer3_block1"]["conv2"]["kernel"],
            np.transpose(sd["layer3.1.conv2.weight"], (2, 3, 1, 0)))
        np.testing.assert_allclose(
            out["batch_stats"][enc]["layer2_block0"]["bn2"]["var"],
            sd["layer2.0.bn2.running_var"])
    pose_k = out["params"]["cnet_pose"]["conv1"]["kernel"]
    assert pose_k.shape[2] == 6
    np.testing.assert_allclose(pose_k[:, :, :3], w_src / 2)
    np.testing.assert_allclose(pose_k[:, :, 3:], w_src / 2)
    # FPN head untouched
    np.testing.assert_allclose(out["params"]["fnet"]["out_conv"]["kernel"],
                               variables["params"]["fnet"]["out_conv"]["kernel"])


def test_graft_rejects_nonsense(small_vars):
    _, variables = small_vars
    with pytest.raises(ValueError):
        graft_pretrained_encoders(
            variables, {"params": {"nope": {"kernel": np.zeros((1,))}},
                        "batch_stats": {}}, verbose=False)


def test_partial_network_load(tmp_path, small_vars):
    """Matching paths+shapes are adopted, mismatches skipped, remap renames
    leading components (ref `utils/load.py:116-205` semantics)."""
    net, variables = small_vars
    donor = jax.tree.map(lambda x: np.asarray(x) * 0 + 7.0, variables)
    payload = {"payload": {
        "params": serialization.to_state_dict(donor["params"]),
        "batch_stats": serialization.to_state_dict(donor["batch_stats"]),
    }}
    # corrupt one shape so it must be skipped
    payload["payload"]["params"]["depth_head"]["conv1"]["kernel"] = \
        np.zeros((1, 1, 1, 1), np.float32)
    p = tmp_path / "donor.msgpack"
    p.write_bytes(serialization.msgpack_serialize(
        jax.tree.map(np.asarray, payload)))

    out = load_partial_network(variables, str(p), verbose=False)
    np.testing.assert_allclose(
        np.asarray(out["params"]["fnet"]["conv1"]["kernel"]), 7.0)
    # mismatched shape kept fresh init
    np.testing.assert_allclose(
        out["params"]["depth_head"]["conv1"]["kernel"],
        variables["params"]["depth_head"]["conv1"]["kernel"])


def test_partial_load_with_remap(tmp_path, small_vars):
    net, variables = small_vars
    fnet_donor = jax.tree.map(lambda x: np.asarray(x) * 0 + 3.0,
                              serialization.to_state_dict(
                                  variables["params"]["fnet"]))
    payload = {"params": {"model": {"depth_net": {"fnet": fnet_donor}}},
               "batch_stats": {}}
    p = tmp_path / "prefixed.msgpack"
    p.write_bytes(serialization.msgpack_serialize(
        jax.tree.map(np.asarray, payload)))
    out = load_partial_network(variables, str(p),
                               remap={"model/depth_net": ""}, verbose=False)
    np.testing.assert_allclose(
        np.asarray(out["params"]["fnet"]["conv1"]["kernel"]), 3.0)


def test_model_config_wires_perf_knobs():
    """mixed_precision / warp_impl reach the network from a yaml dict."""
    from dro_sfm_tpu.training.trainer import model_config_from
    from dro_sfm_tpu.utils.config import load_config
    cfg = load_config(overrides={
        "model": {"name": "SupModelMF",
                  "depth_net": {"version": "it12-h-out",
                                "mixed_precision": True,
                                "warp_impl": "matmul"}}})
    mc = model_config_from(cfg)
    assert mc.mixed_precision is True
    assert mc.warp_impl == "matmul"
    net = mc.build_net()
    assert net.dtype == jnp.bfloat16
    assert net.warp_impl == "matmul"
