"""Train state, optimizer construction, LR schedules.

Replaces the reference's `configure_optimizers`
(`/root/reference/dro_sfm/models/model_wrapper.py:160-209`): Adam with
depth/pose parameter groups and an epoch-stepped scheduler (StepLR /
MultiStepLR / CosineAnnealing). Here the schedule is a pure function of the
optimizer step (epoch boundaries = steps_per_epoch), baked into optax, and
the whole state (params, batch stats, optimizer moments, step) is one pytree
— so checkpoints restore optimizer state exactly, fixing the reference's
dropped-optimizer-state resume (`model_wrapper.py:195-202`).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state)


def lr_schedule(name: str, base_lr: float, steps_per_epoch: int,
                step_size: int = 10, gamma: float = 0.5,
                milestones=(10, 15, 20, 25, 30, 35, 40, 45),
                t_max: int = 20, eta_min: float = 1e-7,
                warmup_steps: int = 0):
    """Epoch-granular schedules as functions of the optimizer step.

    Mirrors `model_wrapper.py:176-194` scheduler dispatch.
    ``warmup_steps`` > 0 ramps the lr linearly from 0 over the first N
    optimizer steps before handing over to the named schedule — an
    addition over the reference (which has no warmup): the recurrent
    refinement's early selfsup dynamics are chaotic (epoch-0 loss
    explosions / constant-disparity collapse within ~10 full-lr steps,
    docs/convergence_selfsup_r5.md) and a short ramp lets pose/depth
    leave the degenerate near-identity regime gradually. Default 0 =
    exact reference behavior.
    """
    spe = max(1, steps_per_epoch)

    def epoch_of(step):
        return step // spe

    if name == "StepLR":
        def fn(step):
            return base_lr * gamma ** (epoch_of(step) // step_size)
    elif name == "MultiStepLR":
        ms = jnp.asarray(milestones)

        def fn(step):
            return base_lr * gamma ** jnp.sum(epoch_of(step) >= ms)
    elif name == "CosineAnnealingLR":
        def fn(step):
            e = jnp.minimum(epoch_of(step), t_max)
            return eta_min + 0.5 * (base_lr - eta_min) * (
                1 + jnp.cos(jnp.pi * e / t_max))
    else:
        raise ValueError(f"Unknown scheduler {name}")
    if warmup_steps and warmup_steps > 0:
        base_fn = fn

        def fn(step):
            ramp = jnp.minimum(1.0, (step + 1) / warmup_steps)
            return ramp * base_fn(step)
    return fn


def group_schedule(group_cfg, scheduler_cfg, steps_per_epoch: int):
    """LR schedule for one optimizer parameter group (also used by the
    trainer to report the current lr to the experiment logger)."""
    return lr_schedule(
        scheduler_cfg.name, group_cfg.lr, steps_per_epoch,
        step_size=scheduler_cfg.step_size, gamma=scheduler_cfg.gamma,
        milestones=tuple(scheduler_cfg.milestones),
        t_max=scheduler_cfg.T_max, eta_min=scheduler_cfg.eta_min,
        warmup_steps=getattr(scheduler_cfg, "warmup_steps", 0))


def make_optimizer(optimizer_cfg, scheduler_cfg, steps_per_epoch: int,
                   ) -> optax.GradientTransformation:
    """Adam/SGD + schedule from reference-style config nodes.

    Two parameter groups with their own lr / weight-decay, matching the
    reference's Depth/Pose optimizer groups
    (`model_wrapper.py:160-209`): parameters under a top-level ``pose_net``
    module (the single-frame pose network) use ``optimizer.pose``;
    everything else — the whole DRO DepthPoseNet, or the single-frame
    ``depth_net`` — uses ``optimizer.depth``.
    """
    def group_tx(group_cfg) -> optax.GradientTransformation:
        schedule = group_schedule(group_cfg, scheduler_cfg, steps_per_epoch)
        wd = group_cfg.weight_decay
        if optimizer_cfg.name == "Adam":
            return (optax.adamw(schedule, weight_decay=wd) if wd > 0
                    else optax.adam(schedule))
        if optimizer_cfg.name == "SGD":
            return optax.sgd(schedule, momentum=optimizer_cfg.momentum)
        raise ValueError(f"Unknown optimizer {optimizer_cfg.name}")

    def labels(params):
        return {k: jax.tree.map(
            lambda _: "pose" if k == "pose_net" else "depth", v)
            for k, v in params.items()}

    tx = optax.multi_transform(
        {"depth": group_tx(optimizer_cfg.depth),
         "pose": group_tx(optimizer_cfg.pose)}, labels)
    clip = getattr(optimizer_cfg, "clip_grad_norm", 0.0) or 0.0
    if clip > 0:
        # Guards the recurrent refinement against saturation collapse
        # (observed: hot lr drives the tanh/sigmoid heads into saturation
        # and training freezes). Off by default (reference parity).
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def initialize_variables(net, rng: jax.Array,
                         sample_batch: Dict[str, Any]) -> Dict:
    """Fresh variable tree for a sample batch (jitted init: on
    remote-attached TPUs eager op-by-op dispatch of the hundreds of
    initializer ops is catastrophically slow)."""
    init_fn = jax.jit(lambda r, b: net.init(
        r, b["rgb"], b["rgb_context"], b["intrinsics"], train=False))
    return init_fn(rng, {k: sample_batch[k]
                         for k in ("rgb", "rgb_context", "intrinsics")})


def create_train_state(net, rng: jax.Array, sample_batch: Dict[str, Any],
                       tx: optax.GradientTransformation,
                       init_variables: Optional[Dict] = None) -> TrainState:
    """Initialize parameters (or adopt ``init_variables``) and wrap in state."""
    if init_variables is None:
        init_variables = initialize_variables(net, rng, sample_batch)
    params = init_variables["params"]
    batch_stats = init_variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx)
