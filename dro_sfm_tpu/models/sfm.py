"""Task models: DepthPoseNet forward + loss composition.

Functional equivalent of the reference model hierarchy
(`/root/reference/dro_sfm/models/SfmModelMF.py`, `SelfSupModelMF.py`,
`SupModelMF.py`, `SemiSupModelMF.py`): one forward pass producing stacked
depth/pose predictions, composed with the photometric and/or supervised
losses depending on the model name.

The random horizontal-flip augmentation (`SfmModelMF.py:106-127`) flips the
images *and* the intrinsics (fx -> -fx, cx -> W - cx), which re-parameterizes
pixels without changing the 3D geometry, so predicted poses stay valid and
only the depth map needs unflipping. It is implemented branch-free with
`jnp.where` on a PRNG bernoulli so the whole step stays jittable.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dro_sfm_tpu.losses.photometric import (
    PhotometricLossConfig,
    multiview_photometric_loss,
)
from dro_sfm_tpu.losses.supervised import (
    SupervisedLossConfig,
    supervised_depth_pose_loss,
)
from dro_sfm_tpu.models.depth_pose_net import DepthPoseNet
from dro_sfm_tpu.ops.image import flip_intrinsics, flip_lr

MF_MODEL_NAMES = ("SfmModelMF", "SelfSupModelMF", "SupModelMF",
                  "SemiSupModelMFPose")

# Memory-aware perf-knob policy (v5e, 16 GB HBM). The fast path (no remat,
# fully-unrolled refinement scans) keeps O(iters x seq) inner activations
# alive through the backward; past this many batch-pixels that working
# set exhausts HBM. History: round 3 measured 320x960 b8 (2.46M) OOM on
# the no-remat path and set 1.1M; the round-4/5 memory work (bf16 mask
# path, concat-free split convs, fused warp-subtract keeping f32
# products in VMEM) shrank the working set — round 5 measured 320x960
# b8 no-remat at 369.7 ms vs 457.5 ms step-remat (19% faster, no OOM;
# results/remat320_ab_r5.jsonl) — so the threshold now admits the
# reference KITTI operating point. Above it, configs degrade to the
# remat path instead of dying in an XLA allocation dump.
REMAT_AUTO_BATCH_PIXELS = 2_500_000


def resolve_memory_policy(remat, scan_unroll, batch_size: int,
                          image_shape) -> Tuple[bool, str]:
    """Resolve "auto" perf knobs for an operating point.

    ``remat``: True/False/"steps"/"save_named" pass through; "auto" (or
    None) enables full step remat above `REMAT_AUTO_BATCH_PIXELS`
    batch-pixels. ``scan_unroll``: "auto" resolves to "full" (the
    measured fast path — cross-step fusion) — with remat on, the inner
    scans recompute per step so unrolling no longer multiplies live
    activations. Returns (remat, scan_unroll) resolved.
    """
    h, w = int(image_shape[0]), int(image_shape[1])
    batch_pixels = int(batch_size) * h * w
    if remat in ("auto", None):
        remat = batch_pixels > REMAT_AUTO_BATCH_PIXELS
    if scan_unroll in ("auto", None):
        scan_unroll = "full"
    if not isinstance(remat, str):
        remat = bool(remat)
    return remat, str(scan_unroll)
# Single-frame task family (monodepth2-lineage depth/pose nets,
# `/root/reference/dro_sfm/models/SfmModel.py:12-156`): same loss
# compositions applied to the separate depth_net + pose_net pair.
SF_MODEL_NAMES = ("SfmModel", "SelfSupModel", "SupModel", "SemiSupModelPose")
MODEL_NAMES = MF_MODEL_NAMES + SF_MODEL_NAMES


@dataclasses.dataclass(frozen=True)
class SfmModelConfig:
    """Task-model configuration (reference `config.model.*`)."""
    name: str = "SupModelMF"
    version: str = "it12-h-out"
    min_depth: float = 0.1
    max_depth: float = 100.0
    flip_lr_prob: float = 0.5
    supervised_loss_weight: float = 0.9   # SemiSup only (`SemiSupModelMF.py:21`)
    progressive_scaling: float = 0.0      # scale-count anneal (`loss_base.py:40`)
    photometric: PhotometricLossConfig = PhotometricLossConfig()
    mixed_precision: bool = False         # bfloat16 convs (fp32 geometry)
    warp_impl: str = "gather"             # warp sampler: gather | matmul
    sep_conv: str = "split"               # refinement (1,k)/(k,1) convs:
                                          # "split" (concat-free h/x-sliced
                                          # convs — kills the pre-conv
                                          # layout copy, -3.6%/step, exact
                                          # by linearity) | "conv" (lax
                                          # conv) | "matmul" (im2col,
                                          # ops/im2col.py) | "pallas"
                                          # (fused single-dispatch GRU
                                          # pass, ops/pallas/gru_pass.py)
    remat: Any = True                     # recompute refinement steps in bwd
                                          # (True | False | "save_named")
    scan_unroll: str = "none"             # none | inner | full: unroll the
                                          # refinement scans for cross-step
                                          # fusion (more compile time)
    # converted VGG16 msgpack for the perceptual loss term (used when
    # photometric.percep_loss_weight > 0; random init when empty)
    percep_pretrained: str = ""

    def __post_init__(self):
        if self.name not in MODEL_NAMES:
            raise ValueError(f"Unknown model {self.name}; expected {MODEL_NAMES}")

    @property
    def requires_gt_depth(self) -> bool:
        return self.name in ("SupModelMF", "SemiSupModelMFPose",
                             "SupModel", "SemiSupModelPose")

    @property
    def requires_gt_pose(self) -> bool:
        return self.requires_gt_depth

    @property
    def single_frame(self) -> bool:
        return self.name in SF_MODEL_NAMES

    def build_net(self):
        if self.single_frame:
            from dro_sfm_tpu.models.single_frame import SingleFrameNet
            return SingleFrameNet(min_depth=self.min_depth,
                                  max_depth=self.max_depth)
        return DepthPoseNet(
            version=self.version, min_depth=self.min_depth,
            max_depth=self.max_depth,
            dtype=jnp.bfloat16 if self.mixed_precision else jnp.float32,
            warp_impl=self.warp_impl, remat=self.remat,
            unroll=self.scan_unroll, sep_conv=self.sep_conv)

    @property
    def supervised(self) -> SupervisedLossConfig:
        # Single-frame scales are weighted uniformly (packnet-sfm lineage);
        # the MF refinement iterations get the γ decay.
        return SupervisedLossConfig(min_depth=self.min_depth,
                                    max_depth=self.max_depth,
                                    gamma=1.0 if self.single_frame else 0.85,
                                    progressive_scaling=self.progressive_scaling)

    @property
    def photometric_cfg(self) -> PhotometricLossConfig:
        photometric = dataclasses.replace(
            self.photometric, progressive_scaling=self.progressive_scaling)
        if self.single_frame:
            return dataclasses.replace(photometric, gamma=1.0,
                                       normalize_weights=True,
                                       smooth_finest_last=True)
        return photometric


def forward(net: DepthPoseNet, variables: Dict, batch: Dict[str, jnp.ndarray],
            train: bool = False, rng: Optional[jax.Array] = None,
            flip_lr_prob: float = 0.0, last_only: bool = False,
            ) -> Tuple[Dict[str, jnp.ndarray], Dict]:
    """Run the network on a batch, with optional random flip augmentation.

    batch: ``rgb`` [B,H,W,3], ``rgb_context`` [B,N,H,W,3],
    ``intrinsics`` [B,3,3].
    Returns (output dict with ``inv_depths`` [P,B,H,W,1] / ``pose_vecs``
    [B,N,P,6], updated mutable variables e.g. batch_stats).

    ``last_only`` skips the full-resolution upsampling of every
    intermediate prediction (depth stack comes back with P=1) — use it on
    eval/inference paths, which read only ``inv_depths[-1]``; losses need
    the full stack.
    """
    target = batch["rgb"]
    refs = batch["rgb_context"]
    K = batch["intrinsics"]

    do_flip = jnp.asarray(False)
    if train and flip_lr_prob > 0.0 and rng is not None:
        do_flip = jax.random.bernoulli(rng, flip_lr_prob)
        width = target.shape[2]
        target = jnp.where(do_flip, flip_lr(target), target)
        refs = jnp.where(do_flip, flip_lr(refs), refs)
        K = jnp.where(do_flip, flip_intrinsics(K, width), K)

    if train:
        out, updates = net.apply(variables, target, refs, K, train=True,
                                 mutable=["batch_stats"])
    else:
        out = net.apply(variables, target, refs, K, train=False,
                        last_only=last_only)
        updates = {}

    inv_depths = out["inv_depths"]
    if train and flip_lr_prob > 0.0:
        inv_depths = jnp.where(do_flip, flip_lr(inv_depths), inv_depths)
    return {"inv_depths": inv_depths, "pose_vecs": out["pose_vecs"]}, updates


def compute_loss(cfg: SfmModelConfig, output: Dict[str, jnp.ndarray],
                 batch: Dict[str, jnp.ndarray], percep_fn=None,
                 progress=0.0,
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Task loss given the model name.

    Uses the un-jittered originals for the photometric term
    (`SelfSupModelMF.py:91-94`) and GT depth/pose for supervision
    (`SupModelMF.py:108-111`).
    """
    inv_depths = output["inv_depths"]
    pose_vecs = output["pose_vecs"]
    K = batch["intrinsics"]

    if cfg.name in ("SfmModelMF", "SfmModel"):
        return jnp.zeros(()), {}

    if cfg.name in ("SelfSupModelMF", "SelfSupModel"):
        return multiview_photometric_loss(
            batch["rgb_original"], batch["rgb_context_original"],
            inv_depths, K, pose_vecs, cfg.photometric_cfg,
            percep_fn=percep_fn, progress=progress)

    if cfg.name in ("SupModelMF", "SupModel"):
        return supervised_depth_pose_loss(
            inv_depths, batch["depth"], pose_vecs, batch["pose_context"],
            K, cfg.supervised, progress=progress)

    # SemiSupModelMFPose / SemiSupModelPose (`SemiSupModelMF.py:78-118`)
    w = cfg.supervised_loss_weight
    loss = jnp.zeros(())
    metrics: Dict[str, jnp.ndarray] = {}
    if w < 1.0:
        self_loss, self_metrics = multiview_photometric_loss(
            batch["rgb_original"], batch["rgb_context_original"],
            inv_depths, K, pose_vecs, cfg.photometric_cfg,
            percep_fn=percep_fn, progress=progress)
        loss = (1.0 - w) * self_loss
        metrics.update(self_metrics)
    sup_loss, sup_metrics = supervised_depth_pose_loss(
        inv_depths, batch["depth"], pose_vecs, batch["pose_context"],
        K, cfg.supervised, progress=progress)
    loss = loss + w * sup_loss
    metrics.update(sup_metrics)
    return loss, metrics


def forward_and_loss(cfg: SfmModelConfig, net: DepthPoseNet, variables: Dict,
                     batch: Dict[str, jnp.ndarray], rng: jax.Array,
                     percep_fn=None, progress=0.0,
                     ) -> Tuple[jnp.ndarray, Tuple[Dict, Dict, Dict]]:
    """Training closure: forward + loss. Returns (loss, (output, metrics,
    mutable updates)) — the shape `jax.value_and_grad(..., has_aux=True)`
    wants."""
    output, updates = forward(net, variables, batch, train=True, rng=rng,
                              flip_lr_prob=cfg.flip_lr_prob)
    loss, metrics = compute_loss(cfg, output, batch, percep_fn=percep_fn,
                                 progress=progress)
    return loss, (output, metrics, updates)


def make_percep_fn(cfg: SfmModelConfig):
    """Frozen perceptual-distance closure, or None when the term is off.

    The VGG16 slice network is NOT part of the optimized parameters — it is
    a fixed feature extractor closed over by the train step (ImageNet
    weights from ``cfg.percep_pretrained``, a converted msgpack; random
    init otherwise, which still regularizes via random projections).
    """
    uses_photometric = cfg.name in ("SelfSupModelMF", "SelfSupModel",
                                    "SemiSupModelMFPose", "SemiSupModelPose")
    if cfg.photometric_cfg.percep_loss_weight <= 0.0 or not uses_photometric:
        return None
    from dro_sfm_tpu.models.percep import PercepNet
    pnet = PercepNet()
    if cfg.percep_pretrained:
        from flax import serialization
        with open(cfg.percep_pretrained, "rb") as f:
            pvars = serialization.msgpack_restore(f.read())
    else:
        dummy = jnp.zeros((1, 64, 96, 3), jnp.float32)
        pvars = jax.jit(lambda: pnet.init(
            jax.random.PRNGKey(0), dummy, dummy))()
    return lambda im1, im2: pnet.apply(pvars, im1, im2)
