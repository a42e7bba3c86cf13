"""Convert torch state dicts into dro_sfm_tpu flax parameter trees.

Two uses:
1. ImageNet-pretrained torchvision encoders (resnet18 for the feature/
   context encoders — the reference loads these at init,
   `/root/reference/dro_sfm/networks/optim/extractor.py:56-65`; vgg16 for
   PercepNet).
2. Reference dro-sfm checkpoints (`.ckpt` with a `state_dict`) — mapping the
   torch module names onto our flax tree for side-by-side parity checks.

Conventions: torch conv weights are OIHW, flax HWIO; torch linear [out,in],
flax [in,out]; BatchNorm (weight, bias, running_mean, running_var) map to
(scale, bias, mean, var). The reference's multi-image conv1 replication
(`extractor.py:58`) is reproduced for num_input_images > 1.

Usage:
    python tools/convert_torch_weights.py resnet18 resnet18.pth out.msgpack
    python tools/convert_torch_weights.py dro-ckpt indoor_scannet.ckpt out.msgpack
    # or emit an eval-ready framework checkpoint (config carried over):
    python tools/convert_torch_weights.py dro-ckpt indoor_scannet.ckpt out.ckpt
    # then: python scripts/eval.py --checkpoint out.ckpt
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def conv_w(t):
    """OIHW -> HWIO."""
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def convert_resnet18_encoder(state_dict: dict, num_input_images: int = 1,
                             out_prefix: str = "") -> dict:
    """torchvision resnet18 (or the reference's ResNetEncoder trunk) ->
    flax params for `dro_sfm_tpu.models.encoder.ResNetEncoder`.

    Only the trunk (conv1 + layers1-3) is covered — the FPN head of the
    reference encoder is trained from scratch there too.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    w1 = conv_w(sd["conv1.weight"])
    if num_input_images > 1 and w1.shape[2] == 3:
        # Replicate only genuinely single-image (3-channel) weights, e.g.
        # torchvision ImageNet checkpoints; dro-sfm checkpoints already
        # store the multi-image conv1.
        w1 = np.concatenate([w1] * num_input_images, axis=2) / num_input_images
    put(params, ("conv1", "kernel"), w1)

    def bn(src, dst):
        put(params, (*dst, "scale"), sd[f"{src}.weight"])
        put(params, (*dst, "bias"), sd[f"{src}.bias"])
        put(batch_stats, (*dst, "mean"), sd[f"{src}.running_mean"])
        put(batch_stats, (*dst, "var"), sd[f"{src}.running_var"])

    bn("bn1", ("bn1",))
    for li in (1, 2, 3):
        for bi in (0, 1):
            src = f"layer{li}.{bi}"
            dst = f"layer{li}_block{bi}"
            put(params, (dst, "conv1", "kernel"),
                conv_w(sd[f"{src}.conv1.weight"]))
            put(params, (dst, "conv2", "kernel"),
                conv_w(sd[f"{src}.conv2.weight"]))
            bn(f"{src}.bn1", (dst, "bn1"))
            bn(f"{src}.bn2", (dst, "bn2"))
            if f"{src}.downsample.0.weight" in sd:
                put(params, (dst, "downsample_conv", "kernel"),
                    conv_w(sd[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", (dst, "downsample_bn"))
    return {"params": params, "batch_stats": batch_stats}


def convert_vgg16_percep(state_dict: dict) -> dict:
    """torchvision vgg16 -> flax params for `dro_sfm_tpu.models.percep.
    PercepNet` (first three conv stages, `PercepNet.py:13-22`): torchvision
    `features.{0,2,5,7,10,12,14}` conv layers map onto conv0..conv6."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {}
    for i, idx in enumerate((0, 2, 5, 7, 10, 12, 14)):
        params[f"conv{i}"] = {
            "kernel": conv_w(sd[f"features.{idx}.weight"]),
            "bias": sd[f"features.{idx}.bias"],
        }
    return {"params": params}


# Torch module name -> our flax path for the DRO DepthPoseNet. The FPN head
# and heads share names; GRU cells live under the scan modules.
_DRO_ENCODER_HEADS = {
    "upconv1.0": ("upconv1",),
    "upconv1_fusion.0": ("upconv1_fusion",),
    "out_conv": ("out_conv",),
}


def convert_dro_checkpoint(state_dict: dict) -> dict:
    """Map a reference dro-sfm checkpoint onto our DepthPoseNet tree.

    Handles the reference's `model.depth_net.` prefix
    (`/root/reference/dro_sfm/utils/load.py:116-169` equivalents) and the
    module renames of the TPU rebuild:
      fnet/cnet_depth/cnet_pose trunks + FPN heads,
      depth_head/pose_head/upmask_net,
      update_block_depth -> refinement/update_block_depth/cell/...,
      update_block_pose  -> refinement/update_block_pose/cell/...
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("model.depth_net.", "").replace("depth_net.", "")
        sd[k] = np.asarray(v)

    out_params: dict = {}
    out_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def convert_conv(src, dst, bias=True):
        put(out_params, (*dst, "kernel"), conv_w(sd[f"{src}.weight"]))
        if bias and f"{src}.bias" in sd:
            put(out_params, (*dst, "bias"), sd[f"{src}.bias"])

    # Encoders
    for enc, n_img in (("fnet", 1), ("cnet_depth", 1), ("cnet_pose", 2)):
        sub = {k[len(enc) + 1:]: v for k, v in sd.items()
               if k.startswith(enc + ".")}
        tree = convert_resnet18_encoder(sub, num_input_images=n_img)
        out_params[enc] = tree["params"]
        out_stats[enc] = tree["batch_stats"]
        for src, dst in _DRO_ENCODER_HEADS.items():
            if f"{enc}.{src}.weight" in sd:
                convert_conv(f"{enc}.{src}", (enc, *dst))

    # Heads
    convert_conv("depth_head.conv1", ("depth_head", "conv1"))
    convert_conv("depth_head.conv2", ("depth_head", "conv2"))
    convert_conv("pose_head.conv1_pose", ("pose_head", "conv1"))
    convert_conv("pose_head.conv2_pose", ("pose_head", "conv2"))
    convert_conv("upmask_net.mask.0", ("upmask_net", "conv1"))
    convert_conv("upmask_net.mask.2", ("upmask_net", "conv2"))

    # Update blocks (shared weights; ours live inside nn.scan modules)
    def update_block(torch_prefix, ours_prefix, kind):
        base = ("refinement", ours_prefix, "cell")
        enc_map = {
            "encoder.convc1": "convc1", "encoder.convc2": "convc2",
        }
        if kind == "depth":
            enc_map.update({"encoder.convd1": "convd1",
                            "encoder.convd2": "convd2",
                            "encoder.convd": "convd"})
            gru = "depth_gru"
            convert_conv(f"{torch_prefix}.depth_head.conv1",
                         (*base, "head", "conv1"))
            convert_conv(f"{torch_prefix}.depth_head.conv2",
                         (*base, "head", "conv2"))
            # The mask branch is hoisted out of the scan body in the rebuild
            # (runs only on kept predictions) — it lives beside the update
            # blocks under the refinement scope.
            convert_conv(f"{torch_prefix}.mask.0",
                         ("refinement", "mask_head", "mask1"))
            convert_conv(f"{torch_prefix}.mask.2",
                         ("refinement", "mask_head", "mask2"))
        else:
            enc_map.update({"encoder.convp1": "convp1",
                            "encoder.convp2": "convp2",
                            "encoder.convp": "convp"})
            gru = "pose_gru"
            convert_conv(f"{torch_prefix}.pose_head.conv1_pose",
                         (*base, "head", "conv1"))
            convert_conv(f"{torch_prefix}.pose_head.conv2_pose",
                         (*base, "head", "conv2"))
        for src, dst in enc_map.items():
            convert_conv(f"{torch_prefix}.{src}", (*base, "encoder", dst))
        # The rebuild evaluates the independent z and r gates as one
        # 2*hidden-wide conv (models/update.py SepConvGRU): stack the
        # reference's separate convz/convr on the output-channel axis.
        for sfx in ("1", "2"):
            kz = conv_w(sd[f"{torch_prefix}.{gru}.convz{sfx}.weight"])
            kr = conv_w(sd[f"{torch_prefix}.{gru}.convr{sfx}.weight"])
            put(out_params, (*base, "gru", f"convzr{sfx}", "kernel"),
                np.concatenate([kz, kr], axis=-1))
            bz = sd[f"{torch_prefix}.{gru}.convz{sfx}.bias"]
            br = sd[f"{torch_prefix}.{gru}.convr{sfx}.bias"]
            put(out_params, (*base, "gru", f"convzr{sfx}", "bias"),
                np.concatenate([bz, br], axis=-1))
            convert_conv(f"{torch_prefix}.{gru}.convq{sfx}",
                         (*base, "gru", f"convq{sfx}"))

    update_block("update_block_depth", "update_block_depth", "depth")
    update_block("update_block_pose", "update_block_pose", "pose")

    return {"params": out_params, "batch_stats": out_stats}


def emit_framework_ckpt(tree: dict, dst: str, ref_config,
                        epoch: int = 0) -> None:
    """Package a converted tree as an eval-ready framework checkpoint.

    The reference checkpoint embeds its yacs config (`model_checkpoint.py
    :72-78`); our config mirrors the key names, so the operating point
    (network version, depth range, eval image shape, model name) carries
    over and `scripts/eval.py --checkpoint out.ckpt` runs directly.
    """
    from dro_sfm_tpu.training.checkpoint import save_checkpoint
    from dro_sfm_tpu.utils.config import load_config

    overrides: dict = {}
    ref_config = ref_config or {}

    def pick(path):
        node = ref_config
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node

    for path in (("model", "name"),
                 ("model", "depth_net", "name"),
                 ("model", "depth_net", "version"),
                 ("model", "params", "min_depth"),
                 ("model", "params", "max_depth"),
                 ("model", "params", "crop"),
                 ("datasets", "augmentation", "image_shape")):
        val = pick(path)
        if val is None:
            continue
        node = overrides
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = (tuple(val) if isinstance(val, (list, tuple))
                          else val)
    cfg = load_config(overrides=overrides)

    class _State:
        params = tree["params"]
        batch_stats = tree.get("batch_stats", {})
        opt_state = ()
        step = 0

    save_checkpoint(dst, _State(), epoch=int(epoch), config=cfg.to_dict())


def main():
    from dro_sfm_tpu.utils.misc import apply_platform_env
    apply_platform_env()
    import torch
    from flax import serialization

    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    raw = torch.load(src, map_location="cpu")
    state_dict = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else v
                  for k, v in state_dict.items()}
    if kind == "resnet18":
        tree = convert_resnet18_encoder(state_dict)
    elif kind == "vgg16":
        tree = convert_vgg16_percep(state_dict)
    elif kind == "dro-ckpt":
        tree = convert_dro_checkpoint(state_dict)
    else:
        raise SystemExit(f"unknown kind {kind}")
    if kind == "dro-ckpt" and dst.endswith(".ckpt"):
        # Eval-ready framework checkpoint (config carried over from the
        # reference ckpt when present): the direct reference-to-eval path.
        ref_cfg = raw.get("config", {}) if isinstance(raw, dict) else {}
        if hasattr(ref_cfg, "items") and not isinstance(ref_cfg, dict):
            ref_cfg = dict(ref_cfg)  # yacs CfgNode is dict-like
        epoch = int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0
        emit_framework_ckpt(tree, dst, ref_cfg, epoch=epoch)
    else:
        with open(dst, "wb") as f:
            f.write(serialization.msgpack_serialize(tree))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
