"""Serving export: freeze a trained network into a StableHLO artifact.

A production-deployment capability beyond the reference (which can only
serve by carrying the full torch codebase): the checkpoint's weights are
baked into a single serialized `jax.export` artifact that any JAX process
can load and call WITHOUT this package, its config system, or the flax
module tree — `load_serving_artifact(dir).call(target, refs, K)`.

The exported signature matches `inference.make_infer_fn`
(`scripts/infer.py` / `infer_video.py` inner loop):

    (target [B,H,W,3] f32, refs [B,N,H,W,3] f32, K [B,3,3] f32)
        -> (depth [B,H,W] f32, pose_mats [B,N,4,4] f32)

Artifacts are exported for both ``cpu`` and ``tpu`` lowering platforms so
the same blob serves on either. A ``meta.json`` records shapes and the
model's operating point for the serving side.
"""
from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.geometry.pose import Pose
from dro_sfm_tpu.ops.depth_ops import inv2depth

ARTIFACT = "model.stablehlo"
META = "meta.json"


def build_serving_fn(net, variables):
    """The frozen inference function (weights closed over as constants)."""

    def fn(target, refs, K):
        out = net.apply(variables, target, refs, K, train=False,
                        last_only=True)
        inv_depth = out["inv_depths"][-1, ..., 0]          # [B,H,W]
        pose_vecs = out["pose_vecs"][:, :, -1]             # [B,N,6]
        b, n = pose_vecs.shape[0], pose_vecs.shape[1]
        mats = Pose.from_vec(pose_vecs.reshape(b * n, 6), "euler").mat
        return inv2depth(inv_depth), mats.reshape(b, n, 4, 4)

    return fn


def export_serving_artifact(net, variables, out_dir: str,
                            batch: int, views: int,
                            image_shape: Tuple[int, int],
                            platforms=("cpu", "tpu"),
                            dynamic_batch: bool = False,
                            meta_extra=None) -> str:
    """Serialize the frozen net for (batch, views, image_shape); returns
    the artifact path. With ``dynamic_batch`` the leading dimension is a
    symbolic size — one artifact serves any batch (XLA recompiles per
    concrete size at load time, weights stay shared)."""
    from jax import export as jexport

    h, w = image_shape
    os.makedirs(out_dir, exist_ok=True)
    fn = build_serving_fn(net, variables)
    bdim = jexport.symbolic_shape("b")[0] if dynamic_batch else batch
    args = (
        jax.ShapeDtypeStruct((bdim, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((bdim, views, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((bdim, 3, 3), jnp.float32),
    )
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(*args)
    blob = exported.serialize()
    path = os.path.join(out_dir, ARTIFACT)
    with open(path, "wb") as f:
        f.write(blob)
    bsig = "b" if dynamic_batch else batch
    meta = {
        "signature": {
            "target": [bsig, h, w, 3], "refs": [bsig, views, h, w, 3],
            "K": [bsig, 3, 3],
            "outputs": {"depth": [bsig, h, w],
                        "pose_mats": [bsig, views, 4, 4]}},
        "platforms": list(platforms),
        "dynamic_batch": dynamic_batch,
        "bytes": len(blob),
    }
    meta.update(meta_extra or {})
    with open(os.path.join(out_dir, META), "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_serving_artifact(path: str):
    """Load an exported artifact (directory or file). Returns the
    deserialized callable; invoke via ``.call(target, refs, K)``."""
    from jax import export as jexport

    if os.path.isdir(path):
        path = os.path.join(path, ARTIFACT)
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def serving_roundtrip_check(net, variables, artifact_dir: str,
                            batch: int, views: int,
                            image_shape: Tuple[int, int],
                            atol: float = 1e-4) -> float:
    """Assert the artifact reproduces the live model; returns max |Δdepth|."""
    h, w = image_shape
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(size=(batch, h, w, 3)), jnp.float32)
    refs = jnp.asarray(rng.uniform(size=(batch, views, h, w, 3)), jnp.float32)
    K = jnp.broadcast_to(jnp.asarray(
        [[w * 0.8, 0, (w - 1) / 2], [0, w * 0.8, (h - 1) / 2], [0, 0, 1.0]],
        jnp.float32), (batch, 3, 3))
    # Compare against the JITTED live path — that is what the artifact
    # replaces (eager-vs-jit float reassociation differences get amplified
    # through 1/inv_depth on untrained nets and are not a serving defect).
    live = jax.jit(build_serving_fn(net, variables))(target, refs, K)
    frozen = load_serving_artifact(artifact_dir).call(target, refs, K)
    err = float(jnp.abs(live[0] - frozen[0]).max())
    if err > atol:  # not `assert` — must survive python -O in deploy jobs
        raise RuntimeError(f"serving artifact diverges: {err} > {atol}")
    np.testing.assert_allclose(np.asarray(live[1]), np.asarray(frozen[1]),
                               atol=atol)
    return err
