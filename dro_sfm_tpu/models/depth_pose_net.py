"""DepthPoseNet — the DRO recurrent depth+pose optimizer (flax, NHWC).

TPU-native rebuild of
`/root/reference/dro_sfm/networks/depth_pose/DepthPoseNet.py`: shared feature
encoder, initial depth/pose heads, then an alternating block-coordinate
refinement where a depth ConvGRU and a pose ConvGRU descend a per-pixel
feature-metric cost (squared feature difference after warping the reference
features into the target view).

TPU-first design choices (vs. the torch original):
* context views are a tensor axis [B, N, ...]; per-view work (initial poses,
  pose GRU updates, cost evaluation) folds N into the batch so every conv
  and warp runs as one big MXU-friendly op instead of a Python loop;
* the refinement loops are `nn.scan` lifted transforms (weights broadcast,
  carries threaded) — the compiler sees ONE depth step and ONE pose step
  instead of `iters` unrolled copies, cutting XLA compile time ~10x while
  keeping the recurrence exact;
* the warp is a batched gather (`dro_sfm_tpu.ops.resample`), later replaced
  by the fused Pallas warp+cost kernel on the hot path;
* predictions accumulate as stacked arrays (prediction axis first), and
  convex upsampling runs once, vectorized over all predictions;
* `jax.lax.stop_gradient` reproduces the detach-between-outer-iters
  truncated-BPTT semantics (`DepthPoseNet.py:155-156`).

Version strings are parsed with reference semantics (`DepthPoseNet.py:22-36`):
``it{K}`` total refinement steps, ``-h`` 128-d hidden state, ``-out``
normalized (sigmoid->disp_to_depth) depth output, ``-seq{L}`` inner sequence
length (default 4), ``-inter`` intermediate supervision of every inner step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from dro_sfm_tpu.geometry.camera import (
    invert_intrinsics,
    pixel_grid,
    scale_intrinsics,
)
from jax.ad_checkpoint import checkpoint_name

from dro_sfm_tpu.geometry.pose import pose_vec_to_mat
from dro_sfm_tpu.models.encoder import ResNetEncoder
from dro_sfm_tpu.models.update import (
    DepthHead,
    DepthUpdateCell,
    PoseHead,
    PoseUpdateCell,
    UpdateMaskHead,
    UpMaskNet,
)
from dro_sfm_tpu.ops.depth_ops import depth2inv, disp_to_depth, inv2depth  # noqa: F401 (re-export)
from dro_sfm_tpu.ops.matmul_warp import bilinear_sample_matmul
from dro_sfm_tpu.ops.resample import bilinear_sample
from dro_sfm_tpu.ops.upsample import convex_upsample


@dataclasses.dataclass(frozen=True)
class VersionSpec:
    """Parsed network version string (`DepthPoseNet.py:22-36`)."""
    total_iters: int
    seq_len: int
    hidden_dim: int
    out_normalize: bool
    inter_sup: bool

    @property
    def outer_iters(self) -> int:
        return self.total_iters // self.seq_len

    @property
    def num_predictions(self) -> int:
        """1 (init) + per-outer-iteration collected predictions."""
        per_iter = self.seq_len if self.inter_sup else 1
        return 1 + self.outer_iters * per_iter

    @classmethod
    def parse(cls, version: str) -> "VersionSpec":
        assert "it" in version, f"bad version string: {version}"
        total_iters = int(version.split("-")[0].split("it")[1])
        seq_len = 4
        for token in version.split("-"):
            if "seq" in token:
                seq_len = int(token.split("seq")[1])
        return cls(
            total_iters=total_iters,
            seq_len=seq_len,
            hidden_dim=128 if "h" in version else 64,
            out_normalize="out" in version,
            inter_sup="inter" in version,
        )


def _resolve_impl(impl: str) -> str:
    """The Pallas kernel is TPU-only; on other backends degrade to "matmul"
    (identical sampling semantics) so configs stay portable to the CPU test
    mesh and dry runs."""
    if impl == "pallas" and jax.default_backend() != "tpu":
        return "matmul"
    return impl


def _sample_cost(fmap1, fmaps_ref, coords, impl: str):
    """Squared feature difference after bilinear sampling at pixel coords.

    fmap1 [B,h,w,C]; fmaps_ref [B,N,h,w,C]; coords [B,N,h,w,2]
    -> cost [B,N,h,w,C].

    ``impl`` selects the sampler: "pallas" (fused VMEM tent-matmul kernel —
    the fastest train step measured on v5e, tools/perf_ablate.py r2),
    "matmul" (dense tent-weight contraction on the MXU, no scatters), or
    "gather" (XLA gather; scatter-add in the backward). Sampling semantics:
    grid_sample(zeros padding, align_corners) of `DepthPoseNet.py:93-96`.
    """
    impl = _resolve_impl(impl)
    if impl == "pallas":
        from dro_sfm_tpu.ops.pallas.tent_warp import pallas_warp_cost
        return pallas_warp_cost(fmap1, fmaps_ref, coords)
    if impl == "matmul":
        warped = bilinear_sample_matmul(fmaps_ref, coords,
                                        compute_dtype=jnp.bfloat16)
    else:
        warped = bilinear_sample(fmaps_ref, coords)    # [B,N,h,w,C]
    # cost stays in the feature dtype (bf16 features -> bf16 cost traffic;
    # the fp32 sampling weights would otherwise promote it).
    warped = warped.astype(fmap1.dtype)
    diff = fmap1[:, None] - warped
    return diff * diff


def _proj_affine(K_scaled, pose_mats):
    """Compose projection into one affine map on homogeneous pixel rays.

    The reference projects in three grid-sized stages
    (`DepthPoseNet.py:76-96`): lift ``Kinv @ p * d``, rigid transform
    ``R x + t``, project ``K x``. Folding the pixel-independent 3x3 algebra
    together, the homogeneous projection of target pixel ``p`` at depth
    ``d`` is ``(K R Kinv) p * d + K t`` — so the refinement steps only pay
    one grid-sized op per step instead of three (plus the identity-pose
    transform the generic Camera path can't fold away).

    K_scaled [B,3,3]; pose_mats [B,N,4,4] -> A [B,N,3,3] (= K R Kinv),
    b [B,N,3] (= K t).
    """
    Kinv = invert_intrinsics(K_scaled)
    rot = pose_mats[..., :3, :3]
    t = pose_mats[..., :3, 3]
    A = jnp.einsum("bij,bnjk,bkl->bnil", K_scaled, rot, Kinv)
    b = jnp.einsum("bij,bnj->bni", K_scaled, t)
    return A, b


def _proj_to_coords(proj):
    """Homogeneous projections [..., 3] -> pixel coords [..., 2] with the
    reference's z-clamp (`camera.py:177-186`; K's third row is [0,0,1], so
    clamping after the K multiply is identical)."""
    z = jnp.maximum(proj[..., 2], 1e-5)
    return jnp.stack([proj[..., 0] / z, proj[..., 1] / z], axis=-1)


def warp_cost(fmap1, fmaps_ref, depth, pose_vecs, K_scaled,
              impl: str = "gather"):
    """Per-pixel feature-metric cost for every view (reference-shaped API).

    fmap1 [B,h,w,C]; fmaps_ref [B,N,h,w,C]; depth [B,h,w,1];
    pose_vecs [B,N,6]; K_scaled [B,3,3] -> cost [B,N,h,w,C].

    Parity: `DepthPoseNet.py:76-96` — lift target pixels with depth,
    project into each reference camera (Tcw = pose), bilinearly sample the
    reference features (zeros padding, align_corners), squared difference.
    The projection runs as the composed affine map (`_proj_affine`); the
    refinement scans use the split pieces directly so per-iteration
    invariants hoist out of the inner steps.
    """
    impl = _resolve_impl(impl)
    h, w = depth.shape[-3], depth.shape[-2]
    A, b = _proj_affine(K_scaled, pose_vec_to_mat(pose_vecs, "euler"))
    grid = pixel_grid(h, w, dtype=depth.dtype)         # [h,w,3]
    G = jnp.einsum("bnij,hwj->bnhwi", A, grid)         # [B,N,h,w,3]
    proj = G * depth[:, None] + b[:, :, None, None, :]
    return _sample_cost(fmap1, fmaps_ref, _proj_to_coords(proj), impl)


class _DepthStep(nn.Module):
    """One inner depth-refinement step as a scan body: evaluate the
    multi-view cost at the current inverse depth (frozen poses), run the GRU
    cell, integrate the delta (`update.py:155-173`)."""
    hidden_dim: int
    context_dim: int
    ratio: int
    min_depth: float
    max_depth: float
    out_normalize: bool
    dtype: Any = jnp.float32
    warp_impl: str = "gather"
    sep_conv: str = "conv"

    @nn.compact
    def __call__(self, carry, _):
        hidden, inv_depth, consts = carry
        scaled = (disp_to_depth(inv_depth, self.min_depth, self.max_depth)[0]
                  if self.out_normalize else inv_depth)
        # Poses are frozen across the inner depth steps, so the projection
        # is the hoisted affine map: proj = G * d + b (G = (K R Kinv) @ p
        # precomputed per outer iteration) — one grid-sized multiply-add
        # per step instead of the full lift/transform/project chain.
        depth = inv2depth(scaled)
        proj = (consts["G"] * depth[:, None]
                + consts["bvec"][:, :, None, None, :])
        cost = _sample_cost(consts["fmap1"], consts["fmaps_ref"],
                            _proj_to_coords(proj),
                            self.warp_impl).mean(axis=1)
        # Named for the selective remat policy (remat="save_named"):
        # saving the cost map and GRU state keeps the warp + conv chain
        # out of the recompute while the elementwise glue rematerializes.
        cost = checkpoint_name(cost, "cost")
        hidden, delta = DepthUpdateCell(
            hidden_dim=self.hidden_dim, context_dim=self.context_dim,
            ratio=self.ratio, dtype=self.dtype, conv_impl=self.sep_conv,
            name="cell")(
                hidden, inv_depth, cost, consts["inp"])
        hidden = checkpoint_name(hidden, "gru_out")
        inv_depth = inv_depth + delta
        return (hidden, inv_depth, consts), (inv_depth, hidden)


class _PoseStep(nn.Module):
    """One inner pose-refinement step, all views folded into batch:
    evaluate each view's cost at its current pose (frozen depth), run the
    GRU cell, integrate (`update.py:184-199`)."""
    hidden_dim: int
    context_dim: int
    dtype: Any = jnp.float32
    warp_impl: str = "gather"
    sep_conv: str = "conv"

    @nn.compact
    def __call__(self, carry, _):
        hidden, poses, consts = carry                  # poses [B,N,6]
        b, n = poses.shape[0], poses.shape[1]
        # Depth is frozen across the inner pose steps, so the lifted
        # camera-frame points (rays * depth) are hoisted per outer
        # iteration; each step only composes K with the current pose and
        # projects: proj = (K R) points + K t.
        mats = pose_vec_to_mat(poses, "euler")         # [B,N,4,4]
        KR = jnp.einsum("bij,bnjk->bnik", consts["K"], mats[..., :3, :3])
        Kt = jnp.einsum("bij,bnj->bni", consts["K"], mats[..., :3, 3])
        proj = (jnp.einsum("bnij,bhwj->bnhwi", KR, consts["points"])
                + Kt[:, :, None, None, :])
        cost = _sample_cost(consts["fmap1"], consts["fmaps_ref"],
                            _proj_to_coords(proj),
                            self.warp_impl)            # [B,N,h,w,C]
        cost = checkpoint_name(cost, "cost")  # see _DepthStep
        hidden, delta = PoseUpdateCell(
            hidden_dim=self.hidden_dim, context_dim=self.context_dim,
            dtype=self.dtype, conv_impl=self.sep_conv, name="cell")(
                hidden, poses.reshape(b * n, 6),
                cost.reshape(b * n, *cost.shape[2:]), consts["inp"])
        hidden = checkpoint_name(hidden, "gru_out")
        poses = poses + delta.reshape(b, n, 6)
        return (hidden, poses, consts), poses


class _OuterIteration(nn.Module):
    """One alternating refinement iteration (`DepthPoseNet.py:154-197`):
    detach, seq_len depth GRU steps (poses frozen), then seq_len pose GRU
    steps (depth frozen at the iteration start)."""
    spec: VersionSpec
    context_dim: int
    ratio: int
    min_depth: float
    max_depth: float
    dtype: Any = jnp.float32
    warp_impl: str = "gather"
    sep_conv: str = "conv"
    remat: Any = True
    unroll: str = "none"

    @nn.compact
    def __call__(self, carry, _):
        hidden_d, hidden_p, inv_depth, poses, consts = carry
        spec = self.spec

        # Truncated BPTT between outer iterations (`:155-156`).
        inv_depth = jax.lax.stop_gradient(inv_depth)
        poses = jax.lax.stop_gradient(poses)
        scaled = (disp_to_depth(inv_depth, self.min_depth, self.max_depth)[0]
                  if spec.out_normalize else inv_depth)
        depth_frozen = inv2depth(scaled)

        # Per-iteration projection invariants (see _proj_affine): the inner
        # depth steps see frozen poses -> hoist G = (K R Kinv) @ p and
        # b = K t; the inner pose steps see frozen depth -> hoist the
        # lifted camera-frame points rays * d.
        A, bvec = _proj_affine(consts["K"],
                               pose_vec_to_mat(poses, "euler"))
        G = jnp.einsum("bnij,hwj->bnhwi", A, consts["grid"])
        points = consts["rays"] * depth_frozen          # [B,h,w,3]

        depth_consts = {"fmap1": consts["fmap1"],
                        "fmaps_ref": consts["fmaps_ref"],
                        "G": G, "bvec": bvec,
                        "inp": consts["inp_d"]}
        # remat (optional): recompute each refinement step in the backward
        # pass instead of storing every inner activation — the nested scans
        # otherwise keep O(outer x seq x hidden activations) alive (OOM at
        # batch >= 16). At small batch the activations fit, and skipping the
        # recompute is faster.
        if self.remat == "save_named":
            # Selective rematerialization: keep the per-step cost map and
            # GRU hidden state (the conv/warp outputs — expensive to
            # recompute, and the GRU chain would otherwise recompute
            # SEQUENTIALLY through all prior steps); recompute only the
            # elementwise glue. Middle ground between full step remat
            # (max recompute) and no remat (max live activations) for
            # the 320x960 reference operating point.
            pol = jax.checkpoint_policies.save_only_these_names(
                "cost", "gru_out")
            depth_step = nn.remat(_DepthStep, policy=pol)
            pose_step = nn.remat(_PoseStep, policy=pol)
        elif self.remat:
            depth_step = nn.remat(_DepthStep)
            pose_step = nn.remat(_PoseStep)
        else:
            depth_step, pose_step = _DepthStep, _PoseStep
        # Unrolling the inner scans lets XLA fuse across step boundaries and
        # drops the while-loop bookkeeping — the refinement loop runs at
        # tiny stride-8 grids where per-op overhead, not FLOPs, dominates.
        inner_unroll = spec.seq_len if self.unroll in ("inner", "full") else 1
        DepthScan = nn.scan(
            depth_step, variable_broadcast="params",
            split_rngs={"params": False}, length=spec.seq_len,
            unroll=inner_unroll)
        (hidden_d, inv_depth, _), (d_seq, h_seq) = DepthScan(
            hidden_dim=spec.hidden_dim, context_dim=self.context_dim,
            ratio=self.ratio, min_depth=self.min_depth,
            max_depth=self.max_depth, out_normalize=spec.out_normalize,
            dtype=self.dtype, warp_impl=self.warp_impl,
            sep_conv=self.sep_conv,
            name="update_block_depth")(
                (hidden_d, inv_depth, depth_consts), None)

        pose_consts = {"fmap1": consts["fmap1"],
                       "fmaps_ref": consts["fmaps_ref"],
                       "points": points, "K": consts["K"],
                       "inp": consts["inp_p"]}
        PoseScan = nn.scan(
            pose_step, variable_broadcast="params",
            split_rngs={"params": False}, length=spec.seq_len,
            unroll=inner_unroll)
        (hidden_p, poses, _), p_seq = PoseScan(
            hidden_dim=spec.hidden_dim, context_dim=self.context_dim,
            dtype=self.dtype, warp_impl=self.warp_impl,
            sep_conv=self.sep_conv,
            name="update_block_pose")(
                (hidden_p, poses, pose_consts), None)

        # Keep every inner step with -inter, else the last only (`:176-196`).
        if spec.inter_sup:
            keep_d, keep_h, keep_p = d_seq, h_seq, p_seq
        else:
            keep_d, keep_h, keep_p = (d_seq[-1:], h_seq[-1:], p_seq[-1:])
        # Upsampling masks only for the kept predictions, batched over the
        # keep axis — inside the scan the mask convs would run (fwd + bwd)
        # on every inner step regardless of whether the step's prediction
        # is supervised.
        k = keep_h.shape[0]
        keep_m = UpdateMaskHead(
            hidden_dim=spec.hidden_dim, ratio=self.ratio, dtype=self.dtype,
            name="mask_head")(keep_h.reshape(-1, *keep_h.shape[2:]))
        keep_m = keep_m.reshape(k, -1, *keep_m.shape[1:])
        carry = (hidden_d, hidden_p, inv_depth, poses, consts)
        return carry, (keep_d, keep_m, keep_p)


class DepthPoseNet(nn.Module):
    """Joint recurrent depth + pose network (the DRO optimizer)."""
    version: str = "it12-h-out"
    min_depth: float = 0.1
    max_depth: float = 100.0
    feat_dim: int = 128      # foutput_dim (`DepthPoseNet.py:44`)
    feat_ratio: int = 8      # output stride of the feature net
    context_dim: int = 32    # cdim (`DepthPoseNet.py:53`)
    dtype: Any = jnp.float32  # conv compute dtype (bfloat16 for MXU speed);
                              # geometry, GRU states and heads stay fp32
    warp_impl: str = "gather"  # "gather" | "matmul" | "pallas" (see warp_cost)
    sep_conv: str = "conv"     # refinement separable convs: "conv" | "matmul"
                               # (tap-stacked im2col matmul, ops/im2col.py) |
                               # "pallas" (fused single-dispatch GRU pass,
                               # ops/pallas/gru_pass.py; TPU-only, falls back
                               # to "conv" elsewhere — models/update.py)
    remat: Any = True          # recompute refinement steps in the backward
                               # (True | False | "save_named" policy)
    unroll: str = "none"       # none | inner | full — unroll the refinement
                               # scans (runtime fusion vs compile time)

    @property
    def spec(self) -> VersionSpec:
        return VersionSpec.parse(self.version)

    def scale_inv_depth(self, x: jnp.ndarray) -> jnp.ndarray:
        """Optionally map raw network output to bounded inverse depth."""
        if self.spec.out_normalize:
            return disp_to_depth(x, self.min_depth, self.max_depth)[0]
        return x

    @nn.compact
    def __call__(self, target: jnp.ndarray, refs: jnp.ndarray,
                 intrinsics: jnp.ndarray, train: bool = True,
                 last_only: bool = False) -> Dict[str, Any]:
        """target [B,H,W,3]; refs [B,N,H,W,3]; intrinsics [B,3,3].

        Returns a dict with
        ``inv_depths``: [P,B,H,W,1] full-resolution inverse-depth predictions
        (P = spec.num_predictions, last entry is the final estimate) and
        ``pose_vecs``: [B,N,P,6] per-view 6-DoF predictions
        (layout parity with `DepthPoseNet.py:200-205`).

        ``last_only`` convex-upsamples only the final prediction (P=1 on the
        depth output; pose stack unchanged) — the eval/inference fast path,
        since every intermediate full-resolution upsample is loss-only work
        (all eval consumers read ``inv_depths[-1]``). With unrolled scans
        XLA additionally dead-code-eliminates the unused stacked outputs.
        """
        spec = self.spec
        b, n = refs.shape[0], refs.shape[1]
        h_img, w_img = target.shape[1], target.shape[2]
        hdim, cdim = spec.hidden_dim, self.context_dim

        fnet = ResNetEncoder(out_chs=self.feat_dim, stride=self.feat_ratio,
                             dtype=self.dtype, name="fnet")
        cnet_depth = ResNetEncoder(out_chs=hdim + cdim, stride=self.feat_ratio,
                                   dtype=self.dtype, name="cnet_depth")
        cnet_pose = ResNetEncoder(out_chs=hdim + cdim, stride=self.feat_ratio,
                                  num_input_images=2, dtype=self.dtype,
                                  name="cnet_pose")
        depth_head = DepthHead(hidden_dim=self.feat_dim, dtype=self.dtype,
                               name="depth_head")
        pose_head = PoseHead(hidden_dim=self.feat_dim, dtype=self.dtype,
                             name="pose_head")
        upmask_net = UpMaskNet(hidden_dim=self.feat_dim, ratio=self.feat_ratio,
                               dtype=self.dtype, name="upmask_net")

        def fold(x):  # [B,N,...] -> [B*N,...]
            return x.reshape(b * n, *x.shape[2:])

        # 1) Shared feature encoding of target + refs (`:112-116`).
        all_imgs = jnp.concatenate([target[:, None], refs], axis=1)
        fmaps = fnet(all_imgs.reshape(b * (n + 1), h_img, w_img, 3), train=train)
        fmaps = fmaps.reshape(b, n + 1, *fmaps.shape[1:])
        fmap1, fmaps_ref = fmaps[:, 0], fmaps[:, 1:]
        h, w = fmap1.shape[1], fmap1.shape[2]
        assert h_img // h == self.feat_ratio

        # 2) Initial pose per view (`:118-121`) — views folded into batch.
        pair_feats = jnp.concatenate(
            [jnp.broadcast_to(fmap1[:, None], fmaps_ref.shape), fmaps_ref],
            axis=-1)
        pose_init = pose_head(fold(pair_feats)).reshape(b, n, 6)

        # 3) Initial depth + convex upsampling (`:123-128`).
        inv_depth_init = depth_head(fmap1, act_fn=nn.sigmoid)  # [B,h,w,1] fp32
        up_mask_init = upmask_net(fmap1)

        coarse_preds = [inv_depth_init[None]]       # [1,B,h,w,1]
        mask_preds = [up_mask_init[None]]
        pose_preds = [pose_init[None]]              # [1,B,N,6]

        # 4) Context features for the GRUs (`:132-147`). Hidden states and
        # context inputs live in the compute dtype: in bf16 mode the scan
        # carries/consts are bf16 (HBM-bandwidth savings on the dominant
        # refinement traffic); geometry states (inv_depth, poses) stay fp32.
        if spec.outer_iters > 0:
            cd = cnet_depth(target, train=train).astype(self.dtype)
            hidden_d = jnp.tanh(cd[..., :hdim])
            inp_d = nn.relu(cd[..., hdim:])

            pairs = jnp.concatenate(
                [jnp.broadcast_to(target[:, None], refs.shape), refs], axis=-1)
            cp = cnet_pose(fold(pairs), train=train).astype(self.dtype)
            hidden_p = jnp.tanh(cp[..., :hdim])      # [B*N,h,w,hdim]
            inp_p = nn.relu(cp[..., hdim:])

            K_scaled = scale_intrinsics(intrinsics, 1.0 / self.feat_ratio)
            # Pixel grid and camera rays (Kinv @ p) are step-invariant:
            # computed once per forward, consumed by the per-iteration
            # projection hoists in _OuterIteration.
            grid = pixel_grid(h, w, dtype=jnp.float32)
            rays = jnp.einsum("bij,hwj->bhwi",
                              invert_intrinsics(K_scaled), grid)
            consts = {"fmap1": fmap1, "fmaps_ref": fmaps_ref,
                      "K": K_scaled, "grid": grid, "rays": rays,
                      "inp_d": inp_d, "inp_p": inp_p}

            OuterScan = nn.scan(
                _OuterIteration, variable_broadcast="params",
                split_rngs={"params": False}, length=spec.outer_iters,
                unroll=spec.outer_iters if self.unroll == "full" else 1)
            carry = (hidden_d, hidden_p, inv_depth_init, pose_init, consts)
            _, (d_out, m_out, p_out) = OuterScan(
                spec=spec, context_dim=cdim, ratio=self.feat_ratio,
                min_depth=self.min_depth, max_depth=self.max_depth,
                dtype=self.dtype, warp_impl=self.warp_impl,
                sep_conv=self.sep_conv,
                remat=self.remat, unroll=self.unroll,
                name="refinement")(carry, None)
            # [O,keep,...] -> [O*keep,...]
            coarse_preds.append(d_out.reshape(-1, *d_out.shape[2:]))
            mask_preds.append(m_out.reshape(-1, *m_out.shape[2:]))
            pose_preds.append(p_out.reshape(-1, *p_out.shape[2:]))

        coarse = jnp.concatenate(coarse_preds, axis=0)   # [P,B,h,w,1]
        masks = jnp.concatenate(mask_preds, axis=0)      # [P,B,h,w,9r^2]
        poses = jnp.concatenate(pose_preds, axis=0)      # [P,B,N,6]
        if last_only:
            coarse, masks = coarse[-1:], masks[-1:]

        # 5) Convex upsampling + output normalization, vectorized over all
        # predictions at once (`:63-74`, `:179-181`).
        inv_depths = self.scale_inv_depth(
            convex_upsample(coarse, masks, ratio=self.feat_ratio))

        return {
            "inv_depths": inv_depths,                          # [P,B,H,W,1]
            "pose_vecs": jnp.transpose(poses, (1, 2, 0, 3)),   # [B,N,P,6]
        }
