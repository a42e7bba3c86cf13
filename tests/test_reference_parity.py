"""End-to-end numerical parity: reference torch DepthPoseNet vs TPU rebuild.

Builds the ACTUAL upstream network (imported from `/root/reference` via
`tests.reference_shim`), converts its state dict onto the flax tree with
`tools.convert_torch_weights.convert_dro_checkpoint`, runs both on identical
inputs and asserts the final inverse-depth map and 6-DoF pose vectors agree.

This is the proof that the rebuilt network computes what
`/root/reference/dro_sfm/networks/depth_pose/DepthPoseNet.py:107-205`
computes — op-level oracles (test_resample, test_convert_weights) localize
failures; this test certifies the composition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_shim import load_reference_depth_pose_net  # noqa: E402
from tools.convert_torch_weights import convert_dro_checkpoint  # noqa: E402

B, N, H, W = 1, 2, 64, 96


def _flat_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    target = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    refs = rng.uniform(size=(B, N, H, W, 3)).astype(np.float32)
    # plausible pinhole intrinsics for a WxH image
    K = np.array([[[0.9 * W, 0.0, 0.5 * W],
                   [0.0, 1.2 * H, 0.5 * H],
                   [0.0, 0.0, 1.0]]], np.float32).repeat(B, axis=0)
    return target, refs, K


def _build_pair(version):
    """Reference torch net + our flax net initialized with ITS weights."""
    from dro_sfm_tpu.models.depth_pose_net import DepthPoseNet

    tnet = load_reference_depth_pose_net(version)
    tnet.eval()
    state_dict = {k: v.detach().numpy() for k, v in tnet.state_dict().items()
                  if "num_batches_tracked" not in k}
    converted = convert_dro_checkpoint(state_dict)

    jnet = DepthPoseNet(version=version)
    target, refs, K = _make_inputs()
    variables = jnet.init(jax.random.PRNGKey(0), jnp.asarray(target),
                          jnp.asarray(refs), jnp.asarray(K), train=False)

    # The converted tree must cover the init tree EXACTLY — a missing path
    # means the converter silently leaves random weights in place.
    init_p = _flat_paths(variables["params"])
    conv_p = _flat_paths(converted["params"])
    missing = set(init_p) - set(conv_p)
    extra = set(conv_p) - set(init_p)
    assert not missing, f"converter leaves random params: {sorted(missing)}"
    assert not extra, f"converter writes unknown params: {sorted(extra)}"
    for path, v in conv_p.items():
        assert v.shape == init_p[path].shape, (
            f"{path}: converted {v.shape} vs model {init_p[path].shape}")

    init_s = _flat_paths(variables.get("batch_stats", {}))
    conv_s = _flat_paths(converted["batch_stats"])
    assert set(init_s) == set(conv_s), (
        set(init_s) ^ set(conv_s))

    return tnet, jnet, converted, (target, refs, K)


@pytest.mark.slow
@pytest.mark.parametrize("version", ["it12-h-out", "it2-seq2-h-out-inter",
                                     "it2-seq2-h"])
def test_forward_parity_eval(version):
    """Final inv-depth + poses match the reference in eval mode (<1e-3)."""
    tnet, jnet, variables, (target, refs, K) = _build_pair(version)

    with torch.no_grad():
        t_target = torch.from_numpy(target).permute(0, 3, 1, 2)
        t_refs = [torch.from_numpy(refs[:, i]).permute(0, 3, 1, 2)
                  for i in range(N)]
        t_inv, t_pose = tnet(t_target, t_refs, torch.from_numpy(K.copy()))
    t_inv = t_inv.permute(0, 2, 3, 1).numpy()          # [B,H,W,1]
    t_pose = t_pose.numpy()                            # [B,N,6]

    out = jnet.apply(variables, jnp.asarray(target), jnp.asarray(refs),
                     jnp.asarray(K), train=False)
    j_inv = np.asarray(out["inv_depths"][-1])          # [B,H,W,1]
    j_pose = np.asarray(out["pose_vecs"][:, :, -1])    # [B,N,6]

    np.testing.assert_allclose(j_pose, t_pose, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(j_inv, t_inv, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_forward_parity_all_predictions():
    """Every stacked prediction (P inv-depths, P pose steps) matches the
    reference's training-mode output lists, confirming prediction layout
    parity (`DepthPoseNet.py:200-205`)."""
    version = "it12-h-out"
    tnet, jnet, variables, (target, refs, K) = _build_pair(version)
    tnet.eval()  # running-stat BN; training-mode *outputs* via .training flag
    tnet.training = True
    for m in tnet.modules():
        m.training = False  # keep BN/dropout in eval, only gate the return
    tnet.training = True

    with torch.no_grad():
        t_target = torch.from_numpy(target).permute(0, 3, 1, 2)
        t_refs = [torch.from_numpy(refs[:, i]).permute(0, 3, 1, 2)
                  for i in range(N)]
        t_invs, t_poses = tnet(t_target, t_refs, torch.from_numpy(K.copy()))
    t_invs = np.stack([p.permute(0, 2, 3, 1).numpy() for p in t_invs])
    t_poses = t_poses.numpy()                          # [B,N,P,6]

    out = jnet.apply(variables, jnp.asarray(target), jnp.asarray(refs),
                     jnp.asarray(K), train=False)
    j_invs = np.asarray(out["inv_depths"])             # [P,B,H,W,1]
    j_poses = np.asarray(out["pose_vecs"])             # [B,N,P,6]

    assert j_invs.shape == t_invs.shape
    assert j_poses.shape == t_poses.shape
    np.testing.assert_allclose(j_poses, t_poses, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(j_invs, t_invs, rtol=1e-3, atol=1e-4)
