"""Reference-checkpoint → eval-ready framework checkpoint, end to end.

A user holding one of the reference's published `.ckpt` files must be able
to run `tools/convert_torch_weights.py dro-ckpt ref.ckpt out.ckpt` and then
`scripts/eval.py --checkpoint out.ckpt` directly. This fabricates a
reference-style checkpoint (actual reference model code via the torchvision
shim, with the yacs-layout config dict the reference embeds,
`model_checkpoint.py:72-78`) and checks the converted checkpoint loads
through `inference.load_model` and reproduces the torch forward.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W, N = 64, 96, 2
VERSION = "it4-h-out-seq2"


@pytest.mark.slow
def test_reference_ckpt_to_eval_ckpt(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.reference_shim import load_reference_depth_pose_net

    tnet = load_reference_depth_pose_net(VERSION, min_depth=0.2,
                                         max_depth=20.0)
    tnet.eval()
    ref_ckpt = str(tmp_path / "reference.ckpt")
    torch.save({
        "state_dict": {f"model.depth_net.{k}": v
                       for k, v in tnet.state_dict().items()
                       if "num_batches_tracked" not in k},
        "epoch": 7,
        "config": {
            "model": {"name": "SupModelMF",
                      "depth_net": {"name": "DepthPoseNet",
                                    "version": VERSION},
                      "params": {"min_depth": 0.2, "max_depth": 20.0,
                                 "crop": ""}},
            "datasets": {"augmentation": {"image_shape": [H, W]}},
        },
    }, ref_ckpt)

    out_ckpt = str(tmp_path / "converted.ckpt")
    env = dict(os.environ)
    env["DRO_SFM_PLATFORM"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "convert_torch_weights.py"),
         "dro-ckpt", ref_ckpt, out_ckpt],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]

    # Loads through the standard inference path with the carried-over
    # operating point...
    from dro_sfm_tpu.training.checkpoint import load_checkpoint
    assert load_checkpoint(out_ckpt)["meta"]["epoch"] == 7

    from dro_sfm_tpu.inference import load_model
    net, variables, cfg = load_model(out_ckpt)
    assert cfg.model.depth_net.version == VERSION
    assert cfg.model.params.max_depth == 20.0
    assert tuple(cfg.datasets.augmentation.image_shape) == (H, W)

    # ...and reproduces the reference forward on the same inputs.
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    target = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    refs = rng.uniform(size=(1, N, H, W, 3)).astype(np.float32)
    K = np.array([[[0.9 * W, 0, 0.5 * W], [0, 1.2 * H, 0.5 * H],
                   [0, 0, 1.0]]], np.float32)
    out = net.apply(variables, jnp.asarray(target), jnp.asarray(refs),
                    jnp.asarray(K), train=False)
    with torch.no_grad():
        t_inv, t_pose = tnet(
            torch.from_numpy(target).permute(0, 3, 1, 2),
            [torch.from_numpy(refs[:, i]).permute(0, 3, 1, 2)
             for i in range(N)],
            torch.from_numpy(K.copy()))
    j_inv = np.asarray(out["inv_depths"][-1, ..., 0])      # [B,H,W]
    np.testing.assert_allclose(j_inv, t_inv.numpy()[:, 0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pose_vecs"][:, :, -1]),
                               t_pose.numpy(), rtol=1e-3, atol=1e-4)
