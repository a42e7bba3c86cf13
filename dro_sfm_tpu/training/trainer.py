"""The trainer: experiment orchestration + epoch loops.

Rebuild of the reference's ModelWrapper + HorovodTrainer pair
(`/root/reference/dro_sfm/models/model_wrapper.py:25-454`,
`/root/reference/dro_sfm/trainers/horovod_trainer.py:13-189`), reorganized
functionally: the Trainer owns config, datasets, the jitted steps, the
TrainState, the checkpoint manager and metric aggregation. The distributed
behavior of the original (DistributedSampler shards, gradient allreduce,
metric reduction, rank-0 gating) maps to host-sharded loaders, GSPMD
sharding inside the jitted step, jnp reductions over gathered per-sample
metrics, and `jax.process_index() == 0` gating.
"""
from __future__ import annotations

import dataclasses
import signal
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dro_sfm_tpu.data import make_loader, setup_dataset
from dro_sfm_tpu.models.sfm import SfmModelConfig
from dro_sfm_tpu.losses.photometric import PhotometricLossConfig
from dro_sfm_tpu.parallel.mesh import (
    is_rank0,
    make_mesh,
    maybe_init_distributed,
    shard_batch,
)
from dro_sfm_tpu.training.checkpoint import CheckpointManager, load_checkpoint
from dro_sfm_tpu.training.metrics import (
    ALL_METRIC_NAMES,
    METRIC_MODES,
    MetricsConfig,
    compute_pose_metrics,
)
from dro_sfm_tpu.training.state import (
    create_train_state,
    group_schedule,
    initialize_variables,
    make_optimizer,
)
from dro_sfm_tpu.training.step import make_eval_step, make_train_step
from dro_sfm_tpu.utils.logging import AvgMeter, pcolor, print_metrics_table


def model_config_from(cfg) -> SfmModelConfig:
    """Build the task-model config from a full ConfigNode."""
    loss = cfg.model.loss
    # min/max depth flow from model.params into both the network and the
    # losses (`model_wrapper.py:570-583`).
    min_depth = cfg.model.params.min_depth or 0.1
    max_depth = cfg.model.params.max_depth
    # "auto" perf knobs resolve against the TRAIN operating point (remat
    # only affects the backward pass; eval never rematerializes).
    from dro_sfm_tpu.models.sfm import resolve_memory_policy
    remat, scan_unroll = resolve_memory_policy(
        cfg.model.depth_net.get("remat", True),
        cfg.model.depth_net.get("scan_unroll", "none"),
        cfg.datasets.train.batch_size,
        cfg.datasets.augmentation.image_shape)
    return SfmModelConfig(
        name=cfg.model.name,
        version=cfg.model.depth_net.version,
        min_depth=min_depth, max_depth=max_depth,
        mixed_precision=bool(cfg.model.depth_net.get("mixed_precision", False)),
        warp_impl=cfg.model.depth_net.get("warp_impl", "gather"),
        sep_conv=cfg.model.depth_net.get("sep_conv", "conv"),
        remat=remat,
        scan_unroll=scan_unroll,
        flip_lr_prob=loss.flip_lr_prob,
        supervised_loss_weight=loss.supervised_loss_weight,
        progressive_scaling=loss.get("progressive_scaling", 0.0),
        percep_pretrained=cfg.model.percep_net.checkpoint_path,
        photometric=PhotometricLossConfig(
            percep_loss_weight=loss.get("percep_loss_weight", 0.0),
            ssim_loss_weight=loss.ssim_loss_weight,
            smooth_loss_weight=loss.smooth_loss_weight,
            c1=loss.C1, c2=loss.C2,
            photometric_reduce_op=loss.photometric_reduce_op,
            clip_loss=loss.clip_loss,
            automask_loss=loss.automask_loss))


class Trainer:
    def __init__(self, cfg, resume: Optional[str] = None):
        maybe_init_distributed()
        self.cfg = cfg
        self.model_cfg = model_config_from(cfg)
        self.net = self.model_cfg.build_net()
        self.metrics_cfg = MetricsConfig(
            crop=cfg.model.params.crop,
            min_depth=cfg.model.params.min_depth,
            max_depth=cfg.model.params.max_depth)
        # Data-parallel axis = largest divisor of the per-host batch that the
        # device count supports (a 2-sample debug batch on an 8-device mesh
        # shards over 2, replicating across the rest). arch.spatial_shards
        # devices per replica additionally split image heights (GSPMD
        # spatial partitioning — the path for resolutions where one chip
        # cannot hold batch-1 activations).
        n_dev = len(jax.devices())
        self.spatial = max(1, int(cfg.arch.get("spatial_shards", 1)))
        if n_dev % self.spatial:
            raise ValueError(
                f"arch.spatial_shards={self.spatial} must divide the device "
                f"count {n_dev}")
        # Each spatial group must sit on ONE host: shard_batch assembles
        # global arrays from per-process data that is complete along the
        # height axis, and halo exchange should ride ICI, not DCN.
        if jax.local_device_count() % self.spatial:
            raise ValueError(
                f"arch.spatial_shards={self.spatial} must divide the LOCAL "
                f"device count {jax.local_device_count()} (spatial groups "
                f"cannot span hosts)")
        if self.spatial > 1 and self.model_cfg.warp_impl == "pallas":
            # pallas_call has no GSPMD partitioning rule, so height-sharded
            # operands would be all-gathered around it; the dense matmul
            # warp partitions like any einsum. Same sampling semantics.
            self.model_cfg = dataclasses.replace(self.model_cfg,
                                                 warp_impl="matmul")
            self.net = self.model_cfg.build_net()
            # Reflect the downgrade in the config so wandb logs and
            # checkpoint-embedded configs record what actually ran.
            cfg.model.depth_net.warp_impl = "matmul"
            if is_rank0():
                print("spatial_shards>1: warp_impl 'pallas' has no GSPMD "
                      "partitioning rule — running the dense matmul warp "
                      "(identical sampling semantics)")
        avail = n_dev // self.spatial
        bs = cfg.datasets.train.batch_size
        if jax.process_count() > 1:
            # Multi-process: every process must own shards of every jitted
            # computation, so the mesh must span ALL devices — a subset
            # mesh that excludes a host would leave that host's
            # make_array_from_process_local_data with no destination.
            dp = avail
            if (bs * jax.process_count()) % dp:
                raise ValueError(
                    f"global batch {bs}*{jax.process_count()} must divide "
                    f"by data-parallel width {dp} "
                    f"({n_dev} devices / spatial_shards={self.spatial})")
        else:
            dp = max(d for d in range(1, avail + 1)
                     if bs % d == 0 and avail % d == 0)
        self.mesh = make_mesh(jax.devices()[:dp * self.spatial],
                              data_parallel=dp)
        self._eval_meshes: Dict[int, object] = {}  # batch size -> local mesh
        self._eval_vars: Dict = {}  # {"step": opt step, bs: placed vars}
        self.rng = jax.random.PRNGKey(cfg.arch.seed)

        # Datasets + loaders. Eval datasets stay separate per split entry
        # (`model_wrapper.py:105-130`): one loader + metric prefix each.
        aug = cfg.datasets.augmentation
        # Train data is optional: eval-only runs (scripts/eval.py on a
        # converted reference ckpt, tools/eval_reference_ckpt.py) have no
        # training data on the machine — reference analogue:
        # `ModelWrapper(load_datasets=False)` eval paths.
        self.train_dataset = None
        self.train_loader = None
        if cfg.datasets.train.dataset:
            self.train_dataset = setup_dataset(cfg.datasets.train, aug,
                                               "train")
        self.val_datasets = (
            setup_dataset(cfg.datasets.validation, aug, "validation")
            if cfg.datasets.validation.dataset else [])
        self.test_datasets = None
        if cfg.datasets.test.dataset:
            self.test_datasets = setup_dataset(cfg.datasets.test, aug, "test")
        if self.train_dataset is not None:
            self.train_loader = make_loader(
                self.train_dataset, cfg.datasets.train.batch_size, "train",
                num_workers=cfg.datasets.train.num_workers,
                seed=cfg.arch.seed)
        self.val_loaders = [
            make_loader(ds, cfg.datasets.validation.batch_size, "validation",
                        num_workers=cfg.datasets.validation.num_workers)
            for ds in self.val_datasets]

        # Optimizer / state
        steps_per_epoch = (max(1, len(self.train_loader))
                           if self.train_loader is not None else 1)
        self.tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                                 steps_per_epoch)
        # per-group schedules, re-evaluated for logger lr reporting (the
        # pose group only differs for single-frame models with a separate
        # pose_net, `model_wrapper.py:160-209`)
        self._lr_fn = group_schedule(cfg.model.optimizer.depth,
                                     cfg.model.scheduler, steps_per_epoch)
        self._pose_lr_fn = (
            group_schedule(cfg.model.optimizer.pose, cfg.model.scheduler,
                           steps_per_epoch)
            if self.model_cfg.single_frame else None)
        sample = self._sample_batch()
        init_rng, self.rng = jax.random.split(self.rng)
        init_vars = initialize_variables(self.net, init_rng, sample)
        pretrained = cfg.model.depth_net.get("pretrained_encoders", "")
        if pretrained:
            from dro_sfm_tpu.training.init_weights import (
                graft_pretrained_encoders, load_msgpack_tree)
            init_vars = graft_pretrained_encoders(
                init_vars, load_msgpack_tree(pretrained),
                verbose=is_rank0())
        if cfg.model.checkpoint_path:
            # Warm-start from another experiment's checkpoint, partial-load
            # semantics (ref `utils/load.py:116-205`).
            from dro_sfm_tpu.training.init_weights import load_partial_network
            init_vars = load_partial_network(
                init_vars, cfg.model.checkpoint_path, verbose=is_rank0())
        self.state = create_train_state(self.net, init_rng, sample, self.tx,
                                        init_variables=init_vars)
        self.current_epoch = 0
        if resume:
            restored = load_checkpoint(resume, self.state)
            p = restored["payload"]
            self.state = self.state.replace(
                params=p["params"], batch_stats=p["batch_stats"],
                opt_state=p["opt_state"],
                step=jnp.asarray(p["step"], jnp.int32))
            # Checkpoints are written at the END of an epoch: resume with
            # the next one (the reference re-ran the saved epoch,
            # `model_wrapper.py:102-103`).
            self.current_epoch = int(restored["meta"].get("epoch", -1)) + 1

        # Jitted steps. Eval steps are built lazily per demon_scaling flag:
        # the reference applies translation-normalized GT scaling per eval
        # dataset (`model_wrapper.py:383-384`), so a mixed Demon+ScanNet
        # validation list must NOT share one globally-flagged step.
        self.train_step = make_train_step(self.model_cfg, self.net)
        self._eval_steps: Dict[bool, object] = {}

        self.checkpointer = CheckpointManager(
            cfg.checkpoint.filepath, monitor=cfg.checkpoint.monitor,
            save_top_k=cfg.checkpoint.save_top_k, mode=cfg.checkpoint.mode,
            sync_url=cfg.checkpoint.get("s3_url", "")
            or cfg.checkpoint.get("s3_path", ""),
            sync_frequency=int(cfg.checkpoint.get("s3_frequency", 1)))
        self.metric_keys = ALL_METRIC_NAMES
        from dro_sfm_tpu.loggers import make_logger
        self.logger = (make_logger(cfg.wandb, cfg.name) if is_rank0()
                       else None)
        if self.logger:
            self.logger.log_config(cfg)

    # ------------------------------------------------------------------
    def _sample_batch(self):
        if self.train_dataset is not None:
            s = self.train_dataset[0]
        elif self.val_datasets:
            s = self.val_datasets[0][0]
        else:
            assert self.test_datasets, "no dataset to shape-init from"
            s = self.test_datasets[0][0]
        batch = {k: jnp.asarray(np.asarray(v)[None])
                 for k, v in s.items()
                 if k in ("rgb", "rgb_context", "intrinsics")}
        return batch

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        self._eval_vars = {}  # release the eval-mesh param replica's HBM
        avg = AvgMeter(50)
        t0 = time.time()
        n_frames = 0
        rng = jax.random.fold_in(self.rng, epoch)
        last_loss = float("nan")
        # training progress for ProgressiveScaling
        # (ref `model_wrapper.py:156-158` current_epoch / max_epochs)
        progress = float(epoch) / max(self.cfg.arch.max_epochs, 1)
        multi_host = jax.process_count() > 1

        def place(batch):
            arrays = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray) and k != "valid"}
            return shard_batch(arrays, self.mesh, spatial=self.spatial > 1)

        # Double-buffered device placement: batch i+1's host->device copy
        # overlaps batch i's step (data/loader.py device_prefetch).
        from dro_sfm_tpu.data.loader import device_prefetch
        for i, (batch, arrays) in enumerate(
                device_prefetch(self.train_loader, place, depth=2)):
            # Stop promptly on preemption; fit() saves the emergency ckpt.
            # Multi-host: only at the shared 10-step cadence, by consensus
            # (hosts must all stop at the same step or collectives hang).
            if multi_host:
                if i % 10 == 0 and self._preempt_consensus():
                    break
            elif getattr(self, "_preempted", False):
                break
            self.state, metrics = self.train_step(self.state, arrays, rng,
                                                  progress)
            n_frames += batch["rgb"].shape[0]
            if (i + 1) % 10 == 0 or i == 0:
                last_loss = float(metrics["loss"])
                run_avg = avg(last_loss)
                if is_rank0():
                    dt = time.time() - t0
                    print(f"epoch {epoch:03d} step {i + 1:05d}/"
                          f"{len(self.train_loader):05d} "
                          f"loss {last_loss:.4f} (avg {run_avg:.4f}) "
                          f"{n_frames / dt:.1f} frames/s", flush=True)
                    if self.logger:
                        # per-step loss/lr to the experiment logger, not
                        # just stdout (ref `model_wrapper.py:229-247`
                        # logs 'loss'/'learning rate' every training step).
                        step_no = int(self.state.step)
                        step_metrics = {
                            "train-loss-step": last_loss,
                            "learning_rate": float(self._lr_fn(step_no)),
                            "global_step": step_no}
                        if self._pose_lr_fn is not None:
                            step_metrics["learning_rate_pose"] = float(
                                self._pose_lr_fn(step_no))
                        self.logger.log_metrics(step_metrics)
        dt = time.time() - t0
        return {"avg_train-loss": avg.get(),
                "train_frames_per_sec": n_frames / max(dt, 1e-9)}

    # ------------------------------------------------------------------
    def validate_all(self, loaders=None, split: str = "validation",
                     save_artifacts: bool = False) -> Dict[str, float]:
        """Evaluate every dataset of a split; the first provides the
        unprefixed monitored metrics, later ones get -<i> prefixes."""
        loaders = loaders if loaders is not None else self.val_loaders
        results: Dict[str, float] = {}
        for i, loader in enumerate(loaders):
            section = self.cfg.datasets[split]
            ds_name = (section.dataset[i] if i < len(section.dataset)
                       else "")
            name = f"{ds_name}-{section.split[i]}" \
                if i < len(section.dataset) else f"{split}-{i}"
            r = self.validate(loader, dataset_name=name,
                              save_artifacts=save_artifacts,
                              demon_scaling=(ds_name == "Demon"))
            if i == 0:
                results.update(r)
            results.update({f"{k}-{i}": v for k, v in r.items()})
        return results

    def _eval_place(self, variables, arrays):
        """Device placement for one eval batch -> (variables, arrays).

        Evaluation is host-local by design (per-host loader shards, local
        metrics, cross-host metric-sum reduction afterwards), so with
        spatial partitioning on, the batch is sharded over a mesh of THIS
        process's devices: heights over ``spatial``, samples over whatever
        ``data`` width the batch size supports. That mesh's device set can
        differ from the train mesh's (eval batch sizes need not divide the
        train data width; other hosts' devices are absent), and a jitted
        computation requires params and inputs on the SAME devices — so the
        (replicated, hence locally addressable) variables are re-placed
        onto the eval mesh once per validate() pass. Without spatial
        sharding the jitted eval step's default placement is already
        correct and everything passes through untouched.
        """
        if self.spatial == 1:
            return variables, arrays
        bs = arrays["rgb"].shape[0]
        mesh = self._eval_meshes.get(bs)
        if mesh is None:
            local = jax.local_devices()
            avail = len(local) // self.spatial
            dp = max(d for d in range(1, avail + 1) if bs % d == 0)
            mesh = make_mesh(local[:dp * self.spatial], data_parallel=dp)
            self._eval_meshes[bs] = mesh
        # Placed-params cache, keyed by optimizer step: reused across the
        # pass's batches and across eval datasets of one epoch, evicted
        # when params advance (and at train_epoch start, to release the
        # extra HBM replica while training).
        step = int(self.state.step)
        if self._eval_vars.get("step") != step:
            self._eval_vars = {"step": step}
        placed = self._eval_vars.get(bs)
        if placed is None:
            from dro_sfm_tpu.parallel.mesh import replicated
            # Round-trip through host memory: post-training variables are
            # committed to the global train mesh, and a direct device_put
            # onto a host-local mesh is a cross-host transfer jax rejects
            # on most backends. The params are fully replicated, so the
            # host fetch is purely local.
            host_vars = jax.tree_util.tree_map(np.asarray, variables)
            placed = jax.device_put(host_vars, replicated(mesh))
            self._eval_vars[bs] = placed
        return placed, shard_batch(arrays, mesh, spatial=True, local=True)

    def eval_step_for(self, demon_scaling: bool = False):
        """The jitted eval step for one dataset's metric mode (cached)."""
        step = self._eval_steps.get(demon_scaling)
        if step is None:
            step = make_eval_step(self.model_cfg, self.net, self.metrics_cfg,
                                  demon_scaling=demon_scaling)
            self._eval_steps[demon_scaling] = step
        return step

    def validate(self, loader=None, dataset_name: str = "validation",
                 save_artifacts: bool = False,
                 demon_scaling: bool = False) -> Dict[str, float]:
        loader = loader or self.val_loaders[0]
        eval_step = self.eval_step_for(demon_scaling)
        variables = self.state.variables
        sums = {m: np.zeros(9) for m in METRIC_MODES}
        pose_sum = np.zeros(3)
        count = 0
        n_batches = 0
        # num_logs depth-image panels spread over the epoch
        # (ref `wandb_logger.py:131-160` log-interval semantics).
        num_logs = self.cfg.wandb.get("num_logs", 5)
        img_interval = max(1, len(loader) // max(num_logs, 1))
        for batch in loader:
            if jax.process_count() == 1 and getattr(self, "_preempted",
                                                    False):
                break  # preemption grace time is short; fit() saves now
            arrays = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray) and k != "valid"}
            out = eval_step(*self._eval_place(variables, arrays))
            if (self.logger and is_rank0()
                    and n_batches % img_interval == 0):
                self.logger.log_depth_images(
                    dataset_name, batch, out,
                    step=int(self.state.step) + n_batches)
            if save_artifacts and is_rank0():
                from dro_sfm_tpu.utils.save import save_depth
                save_depth(batch, out, self.cfg.save)
            valid = batch["valid"]
            if out["metrics"] is not None:
                m = np.asarray(out["metrics"])          # [4,B,9]
                for mi, mode in enumerate(METRIC_MODES):
                    sums[mode] += m[mi][valid].sum(axis=0)
            if "pose_context" in batch:
                pose_sum += compute_pose_metrics(
                    batch["pose_context"], np.asarray(out["pose"]))
            count += int(valid.sum())
            n_batches += 1
        # Cross-host reduction with the 'all samples seen' check armed
        # (`utils/reduce.py:70-71` equivalent): cross-shard padding
        # duplicates carry valid=False, so the global valid count must equal
        # the dataset size exactly.
        if jax.process_count() > 1:
            from dro_sfm_tpu.parallel.collectives import all_reduce_metric_sums
            stacked = np.concatenate(
                [sums[m] for m in METRIC_MODES] + [pose_sum,
                                                   [float(n_batches)]])
            stacked, count = all_reduce_metric_sums(
                stacked, count, expected_total=len(loader.dataset))
            for i, m in enumerate(METRIC_MODES):
                sums[m] = stacked[i * 9:(i + 1) * 9]
            pose_sum = stacked[len(METRIC_MODES) * 9:-1]
            n_batches = int(round(stacked[-1]))
        else:
            assert count == len(loader.dataset) or \
                getattr(self, "_preempted", False), (
                f"eval saw {count} samples, expected {len(loader.dataset)}")
        results: Dict[str, float] = {}
        table = {}
        for mode in METRIC_MODES:
            vec = sums[mode] / max(count, 1)
            # pose metrics are per-batch (sample 0, reference parity) —
            # divide by the GLOBAL batch count after the cross-host sum.
            pose_vec = pose_sum / max(n_batches, 1)
            full = np.concatenate([vec, pose_vec])
            table[f"depth{mode}"] = full
            for name, value in zip(self.metric_keys, full):
                results[f"{name}{mode}"] = float(value)
        if is_rank0():
            print_metrics_table(table, self.metric_keys,
                                title=f"{dataset_name} epoch "
                                      f"{self.current_epoch}")
        return results

    # ------------------------------------------------------------------
    # -- graceful preemption (beyond reference: no recovery path exists
    # there, SURVEY.md §5) -------------------------------------------------
    def _request_preemption(self, signum=None, frame=None):
        """SIGTERM handler: finish the current step, then checkpoint and
        exit the fit loop cleanly (Cloud TPU preemption notice)."""
        self._preempted = True

    def _install_preempt_handler(self):
        try:
            self._prev_sigterm = signal.signal(
                signal.SIGTERM, self._request_preemption)
        except ValueError:  # not the main thread (tests, embedding)
            self._prev_sigterm = None

    def _restore_preempt_handler(self):
        if getattr(self, "_prev_sigterm", None) is not None:
            signal.signal(signal.SIGTERM, self._prev_sigterm)

    def _preempt_consensus(self) -> bool:
        """Cross-host OR of the local preemption flag. SIGTERM may land on
        a subset of hosts (or at different steps); any host entering a
        collective while another already stopped would hang, so every host
        must agree on the stop step. Checked at the shared 10-step logging
        cadence and at phase boundaries — all hosts evaluate it at
        identical step indices."""
        from dro_sfm_tpu.parallel.collectives import any_process_flag
        agreed = any_process_flag(getattr(self, "_preempted", False))
        if agreed:
            self._preempted = True
        return agreed

    def _save_preempt_checkpoint(self, epoch: int) -> None:
        import os

        from dro_sfm_tpu.training.checkpoint import (
            save_checkpoint, sync_checkpoint_dir)
        path = os.path.join(self.checkpointer.dirpath,
                            f"preempt_epoch={epoch:02d}.ckpt")
        save_checkpoint(path, self.state, epoch - 1,
                        config=self.cfg.to_dict())
        # Mirror immediately — on a reclaimed VM the local disk is gone,
        # which is the whole point of the emergency save.
        if self.checkpointer.sync_url:
            sync_checkpoint_dir(self.checkpointer.dirpath,
                                self.checkpointer.sync_url)
        print(pcolor(f"preempted: state saved to {path}; "
                     f"resume with train.py {path}", "yellow"), flush=True)

    def fit(self) -> Dict[str, float]:
        if self.train_loader is None:
            raise ValueError("fit() requires datasets.train.dataset; this "
                             "trainer was built eval-only")
        cfg = self.cfg
        metrics: Dict[str, float] = {}
        # Fresh fit = fresh intent: a caller re-invoking fit() after a
        # handled preemption wants training, not an instant no-op.
        self._preempted = False
        self._install_preempt_handler()
        try:
            for epoch in range(self.current_epoch, cfg.arch.max_epochs):
                self.current_epoch = epoch
                train_metrics = self.train_epoch(epoch)
                if self._preempt_consensus():
                    # Mid-epoch stop: save a resumable emergency checkpoint
                    # (the partial epoch re-runs on resume) and bail out.
                    if is_rank0():
                        self._save_preempt_checkpoint(epoch)
                    break
                val_metrics = self.validate_all()
                metrics = {**train_metrics, **val_metrics}
                if self._preempt_consensus():
                    # SIGTERM landed during validation: skip the (slow)
                    # top-k save + remote sync and emergency-save NOW —
                    # the preemption grace period is short.
                    if is_rank0():
                        self._save_preempt_checkpoint(epoch + 1)
                    break
                if is_rank0():
                    self.checkpointer.check_and_save(
                        self.state, epoch, val_metrics,
                        config=self.cfg.to_dict())
                    if self.logger:
                        self.logger.log_metrics(
                            {**metrics, "epoch": epoch})
        finally:
            self._restore_preempt_handler()
        return metrics

    def test(self, save_artifacts: bool = False) -> Dict[str, float]:
        assert self.test_datasets is not None, "No test dataset configured"
        loaders = [
            make_loader(ds, self.cfg.datasets.test.batch_size, "test",
                        num_workers=self.cfg.datasets.test.num_workers)
            for ds in self.test_datasets]
        return self.validate_all(loaders, split="test",
                                 save_artifacts=save_artifacts)
