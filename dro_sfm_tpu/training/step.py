"""Jitted, mesh-sharded train / eval steps.

The hot loop of the framework — the TPU equivalent of the reference's
per-batch `zero_grad / training_step / backward / step`
(`/root/reference/dro_sfm/trainers/horovod_trainer.py:92-127`) and
`evaluate_depth` flip-TTA evaluation
(`/root/reference/dro_sfm/models/model_wrapper.py:355-399`).

One jitted function per step kind; batches arrive sharded over the mesh's
``data`` axis and parameters replicated, so the backward pass's gradient
mean is a single XLA all-reduce over ICI (the Horovod ring-allreduce
equivalent, inserted by the compiler).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dro_sfm_tpu.geometry.pose import Pose
from dro_sfm_tpu.models.depth_pose_net import DepthPoseNet
from dro_sfm_tpu.models.sfm import (
    SfmModelConfig,
    forward,
    forward_and_loss,
    make_percep_fn,
)
from dro_sfm_tpu.ops.depth_ops import inv2depth
from dro_sfm_tpu.ops.image import flip_intrinsics, flip_lr
from dro_sfm_tpu.training.metrics import MetricsConfig, compute_depth_metrics
from dro_sfm_tpu.training.state import TrainState
from dro_sfm_tpu.utils.depth import post_process_inv_depth


def make_train_step(model_cfg: SfmModelConfig, net: DepthPoseNet):
    """Build the jitted training step: grads + optimizer + BN-stat update."""
    percep_fn = make_percep_fn(model_cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array, progress: float = 0.0,
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, aux = forward_and_loss(model_cfg, net, variables, batch,
                                         step_rng, percep_fn=percep_fn,
                                         progress=progress)
            return loss, aux

        (loss, (_, metrics, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads, new_batch_stats=updates.get("batch_stats",
                                               state.batch_stats))
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return train_step


def make_eval_step(model_cfg: SfmModelConfig, net: DepthPoseNet,
                   metrics_cfg: MetricsConfig, demon_scaling: bool = False):
    """Build the jitted eval step: plain + flipped forward, flip fusion,
    per-sample depth metrics in the four modes, final pose matrices.

    Returns per-batch: metrics [4, B, 9] (modes '', _pp, _gt, _pp_gt),
    depth_pp [B,H,W,1], pose matrices [B,N,4,4].
    """

    @jax.jit
    def eval_step(variables, batch):
        out, _ = forward(net, variables, batch, train=False, last_only=True)
        inv_depth = out["inv_depths"][-1]                      # [B,H,W,1]
        pose_vecs = out["pose_vecs"][:, :, -1]                 # [B,N,6]

        width = batch["rgb"].shape[2]
        flipped = dict(batch)
        flipped["rgb"] = flip_lr(batch["rgb"])
        flipped["rgb_context"] = flip_lr(batch["rgb_context"])
        flipped["intrinsics"] = flip_intrinsics(batch["intrinsics"], width)
        out_f, _ = forward(net, variables, flipped, train=False,
                           last_only=True)
        inv_depth_pp = post_process_inv_depth(
            inv_depth, out_f["inv_depths"][-1], method="mean")

        depth = inv2depth(inv_depth)
        depth_pp = inv2depth(inv_depth_pp)

        gt = batch.get("depth")
        metrics = None
        if gt is not None:
            gt_pose = batch.get("pose_context")
            rows = []
            for mode_pp, mode_gt in ((False, False), (True, False),
                                     (False, True), (True, True)):
                rows.append(compute_depth_metrics(
                    gt, depth_pp if mode_pp else depth, metrics_cfg,
                    use_gt_scale=mode_gt, gt_pose=gt_pose,
                    demon_scaling=demon_scaling, reduce=False))
            metrics = jnp.stack(rows)                           # [4,B,9]

        pose_mats = Pose.from_vec(pose_vecs, "euler").mat       # [B,N,4,4]
        return {
            "metrics": metrics,
            "inv_depth": inv_depth,
            "inv_depth_pp": inv_depth_pp,
            "depth_pp": depth_pp,
            "pose": pose_mats,
        }

    return eval_step
