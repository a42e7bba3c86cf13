"""Weight initialization from external sources: pretrained encoders and
partial checkpoint (warm-start) loading.

TPU-native replacement for two reference mechanisms:
* ImageNet-pretrained encoder trunks — the reference downloads torchvision
  resnet18 at construction (`/root/reference/dro_sfm/networks/optim/
  extractor.py:56-65`); here a converted flax msgpack (produced offline by
  `tools/convert_torch_weights.py resnet18 ...`) is grafted onto the three
  encoder trunks, with conv1 channel replication for the 2-image pose
  context encoder (`extractor.py:58`).
* Partial network loading with prefix remapping — the reference's
  `load_network` tolerates missing/renamed modules when warm-starting from
  another experiment's checkpoint (`/root/reference/dro_sfm/utils/
  load.py:116-205`); `load_partial_network` intersects a saved payload with
  the target tree by path and shape and reports what was adopted.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization


def _flatten(tree: Dict, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (str(k),)))
        else:
            out[prefix + (str(k),)] = v
    return out


def _set_path(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def load_msgpack_tree(path: str) -> Dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


ENCODER_NAMES = ("fnet", "cnet_depth", "cnet_pose")


def graft_pretrained_encoders(variables: Dict, trunk: Dict,
                              verbose: bool = True) -> Dict:
    """Graft a converted single-image resnet18 trunk onto every encoder.

    ``trunk``: {"params": ..., "batch_stats": ...} from
    `convert_torch_weights.convert_resnet18_encoder` (3-channel conv1).
    The conv1 kernel is replicated (and divided by the image count) for
    encoders whose input is a stacked image pair — the reference recipe
    (`extractor.py:57-58`).

    Returns a new variables dict; FPN heads and everything outside the
    trunks keep their fresh initialization (reference parity — those train
    from scratch there too).
    """
    params = serialization.to_state_dict(variables["params"])
    stats = serialization.to_state_dict(variables.get("batch_stats", {}))
    trunk_p = _flatten(trunk["params"])
    trunk_s = _flatten(trunk.get("batch_stats", {}))
    n_grafted = 0
    for enc in ENCODER_NAMES:
        if enc not in params:
            continue
        for src, dst_tree in ((trunk_p, params), (trunk_s, stats)):
            for path, value in src.items():
                target_node = dst_tree.get(enc, {})
                # walk to check existence
                node = target_node
                ok = True
                for p in path:
                    if not isinstance(node, dict) or p not in node:
                        ok = False
                        break
                    node = node[p]
                if not ok:
                    continue
                value = np.asarray(value)
                if path == ("conv1", "kernel") and node.shape[2] != value.shape[2]:
                    n_img = node.shape[2] // value.shape[2]
                    value = np.concatenate([value] * n_img, axis=2) / n_img
                if value.shape != node.shape:
                    raise ValueError(
                        f"pretrained {enc}/{'/'.join(path)}: shape "
                        f"{value.shape} vs model {node.shape}")
                _set_path(dst_tree, (enc, *path), value.astype(node.dtype))
                n_grafted += 1
    if verbose:
        print(f"pretrained encoders: grafted {n_grafted} arrays onto "
              f"{[e for e in ENCODER_NAMES if e in params]}")
    if n_grafted == 0:
        raise ValueError("pretrained encoder graft matched nothing — "
                         "wrong msgpack or model structure")
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


def load_partial_network(variables: Dict, ckpt_path: str,
                         remap: Optional[Dict[str, str]] = None,
                         verbose: bool = True) -> Dict:
    """Adopt every compatible array from a saved checkpoint/msgpack.

    Accepts either a full training checkpoint (payload with params/
    batch_stats) or a bare variables msgpack. ``remap`` renames leading
    path components (e.g. {"depth_net": ""} — the reference's prefix
    surgery, `utils/load.py:144-169`). Arrays are adopted when path and
    shape match; everything else keeps its fresh init, and a summary of
    adopted/skipped counts is printed — the 'partial load' semantics of the
    reference.
    """
    raw = load_msgpack_tree(ckpt_path)
    if "payload" in raw:
        raw = raw["payload"]
    src = {"params": raw.get("params", {}),
           "batch_stats": raw.get("batch_stats", {})}

    def apply_remap(path: Tuple[str, ...]) -> Tuple[str, ...]:
        if not remap:
            return path
        parts = list(path)
        for old, new in remap.items():
            old_parts = tuple(old.split("/"))
            if tuple(parts[:len(old_parts)]) == old_parts:
                repl = [p for p in new.split("/") if p]
                parts = repl + parts[len(old_parts):]
        return tuple(parts)

    out = {"params": serialization.to_state_dict(variables["params"]),
           "batch_stats": serialization.to_state_dict(
               variables.get("batch_stats", {}))}
    adopted, skipped = 0, 0
    for col in ("params", "batch_stats"):
        flat_target = _flatten(out[col])
        for path, value in _flatten(src[col]).items():
            path = apply_remap(path)
            tgt = flat_target.get(path)
            if tgt is None or np.shape(value) != np.shape(tgt):
                skipped += 1
                continue
            _set_path(out[col], path, np.asarray(value).astype(
                np.asarray(tgt).dtype))
            adopted += 1
    if verbose:
        print(f"partial load from {ckpt_path}: adopted {adopted} arrays, "
              f"skipped {skipped}")
    if adopted == 0:
        raise ValueError(f"partial load from {ckpt_path} matched nothing")
    return {**variables, **out}
