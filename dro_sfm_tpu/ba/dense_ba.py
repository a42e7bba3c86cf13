"""Distributed dense bundle adjustment with Schur-complement reduction.

The north-star scale-out extension (BASELINE.json): refine keyframe poses
and per-keyframe depth scales over a covisibility graph by minimizing dense
depth-reprojection consistency, with the structure variables (scales)
eliminated through an exact Schur complement and the edge work sharded
across the device mesh.

Model
-----
Parameters per keyframe i: pose perturbation twist xi_i in se(3) (applied as
T_i <- T_i0 · exp(xi_i)) and a log depth scale sigma_i (D_i <- e^{sigma_i} D_i).
For each covisibility edge (i, j), a static pixel subgrid of frame i is
unprojected with its scaled depth, transformed into frame j, and compared
against frame j's scaled depth sampled bilinearly at the projection:

    r_p = (z_ij(p) - e^{sigma_j} D_j[pi_j(p)]) * valid(p)

Gauss-Newton normal equations split into pose blocks A [6K, 6K], scale
blocks C [K, K] and coupling B [6K, K]; the scales are eliminated exactly:

    (A - B C^{-1} B^T) dxi = -(b_pose - B C^{-1} b_scale)

— the classic Schur trick with depth scales playing the structure role. On
a mesh, edges shard over the ``data`` axis; each device accumulates its
partial H/b and a `psum` assembles the global system (the reduced solve is
replicated — it is tiny compared to the residual work).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dro_sfm_tpu.ba.lie import se3_exp


class BAProblem(NamedTuple):
    poses: jnp.ndarray         # [K,4,4] camera->world initial estimates
    depths: jnp.ndarray        # [K,h,w] keyframe depth maps
    K: jnp.ndarray             # [3,3] shared intrinsics (depth resolution)
    edges_i: jnp.ndarray       # [E] target keyframe index per edge
    edges_j: jnp.ndarray       # [E] source keyframe index per edge


def _edge_residual(params_i, params_j, T_i0, T_j0, D_i, D_j, K, stride):
    """Masked depth-consistency residuals [M] for one edge."""
    xi_i, sigma_i = params_i[:6], params_i[6]
    xi_j, sigma_j = params_j[:6], params_j[6]
    T_i = T_i0 @ se3_exp(xi_i)
    T_j = T_j0 @ se3_exp(xi_j)

    h, w = D_i.shape
    ys = jnp.arange(0, h, stride, dtype=D_i.dtype)
    xs = jnp.arange(0, w, stride, dtype=D_i.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    d = D_i[::stride, ::stride] * jnp.exp(sigma_i)

    pix = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    rays = pix @ jnp.linalg.inv(K).T
    pts_i = rays * d[..., None]
    rel = jnp.linalg.inv(T_j) @ T_i
    pts_j = pts_i @ rel[:3, :3].T + rel[:3, 3]
    proj = pts_j @ K.T
    z = proj[..., 2]
    u = proj[..., 0] / jnp.maximum(z, 1e-6)
    v = proj[..., 1] / jnp.maximum(z, 1e-6)

    # Bilinear sample of D_j at (u, v), zeros outside. Track the spread of
    # the four taps: a large spread means the sample straddles a depth
    # discontinuity, where interpolated depth is meaningless — mask it out
    # (the MVS equivalent of the reference app's depth-gradient filter).
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    wx = u - x0
    wy = v - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    acc = jnp.zeros_like(u)
    wsum = jnp.zeros_like(u)
    tap_min = jnp.full_like(u, jnp.inf)
    tap_max = jnp.zeros_like(u)
    for dy, dx, wt in ((0, 0, (1 - wx) * (1 - wy)), (0, 1, wx * (1 - wy)),
                       (1, 0, (1 - wx) * wy), (1, 1, wx * wy)):
        xi = x0i + dx
        yi = y0i + dy
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        val = D_j[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        ok = ok & (val > 0)
        acc = acc + wt * jnp.where(ok, val, 0.0)
        wsum = wsum + wt * ok
        tap_min = jnp.minimum(tap_min, jnp.where(ok, val, jnp.inf))
        tap_max = jnp.maximum(tap_max, jnp.where(ok, val, 0.0))
    d_j = jnp.where(wsum > 1e-6, acc / jnp.maximum(wsum, 1e-6), 0.0)
    smooth = (tap_max - tap_min) < 0.05 * jnp.maximum(tap_max, 1e-6)

    valid = ((d[...] > 0) & (z > 1e-3) & (d_j > 0)
             & smooth).astype(D_i.dtype)
    valid = jax.lax.stop_gradient(valid)
    r = (z - d_j * jnp.exp(sigma_j)) / jnp.maximum(z, 1e-3)
    return (r * valid).reshape(-1)


def _edge_system(T_i0, T_j0, D_i, D_j, K, stride, robust_c):
    """Per-edge GN blocks at zero perturbation: (r, J_i [M,7], J_j [M,7]).

    Residuals get IRLS Cauchy weights w = 1 / (1 + (r/c)^2) (applied as
    sqrt(w) to both r and J) so depth-discontinuity and occlusion outliers
    do not bias the solution — the role of the reference app's depth
    filtering (`infer_video.py:648-659`) inside the optimizer.
    """
    zero = jnp.zeros(7, T_i0.dtype)
    fn = lambda pi, pj: _edge_residual(pi, pj, T_i0, T_j0, D_i, D_j, K, stride)  # noqa: E731
    r = fn(zero, zero)
    J_i = jax.jacfwd(fn, argnums=0)(zero, zero)
    J_j = jax.jacfwd(fn, argnums=1)(zero, zero)
    if robust_c > 0:
        w = jnp.sqrt(1.0 / (1.0 + (r / robust_c) ** 2))
        r = r * w
        J_i = J_i * w[:, None]
        J_j = J_j * w[:, None]
    return r, J_i, J_j


def _robust_rho(r: jnp.ndarray, robust_c: float) -> jnp.ndarray:
    """Cauchy robust cost rho(r) (0.5 r^2 when robust_c == 0) — the
    objective the IRLS weights of `_edge_system` are the exact IRLS
    linearization of, so a step that increases it is a step the
    linearization did not model and must be rejected (LM guard)."""
    if robust_c <= 0:
        return 0.5 * r * r
    return 0.5 * robust_c * robust_c * jnp.log1p((r / robust_c) ** 2)


def _total_cost(problem: BAProblem, stride: int, robust_c: float):
    """Total robust cost over all edges at the current estimate."""
    r = jax.vmap(
        lambda ti, tj, di, dj: _edge_residual(
            jnp.zeros(7, ti.dtype), jnp.zeros(7, ti.dtype), ti, tj, di, dj,
            problem.K, stride)
    )(problem.poses[problem.edges_i], problem.poses[problem.edges_j],
      problem.depths[problem.edges_i], problem.depths[problem.edges_j])
    return _robust_rho(r, robust_c).sum()


def _accumulate(problem: BAProblem, stride: int, robust_c: float = 0.0):
    """Dense normal equations over all edges: H [7K,7K], b [7K]."""
    k = problem.poses.shape[0]
    r, J_i, J_j = jax.vmap(
        lambda ti, tj, di, dj: _edge_system(ti, tj, di, dj, problem.K,
                                            stride, robust_c)
    )(problem.poses[problem.edges_i], problem.poses[problem.edges_j],
      problem.depths[problem.edges_i], problem.depths[problem.edges_j])

    H = jnp.zeros((k, 7, k, 7), problem.poses.dtype)
    b = jnp.zeros((k, 7), problem.poses.dtype)
    ei, ej = problem.edges_i, problem.edges_j
    H = H.at[ei, :, ei, :].add(jnp.einsum("emi,emj->eij", J_i, J_i))
    H = H.at[ej, :, ej, :].add(jnp.einsum("emi,emj->eij", J_j, J_j))
    H = H.at[ei, :, ej, :].add(jnp.einsum("emi,emj->eij", J_i, J_j))
    H = H.at[ej, :, ei, :].add(jnp.einsum("emi,emj->eij", J_j, J_i))
    b = b.at[ei].add(jnp.einsum("emi,em->ei", J_i, r))
    b = b.at[ej].add(jnp.einsum("emi,em->ei", J_j, r))
    return H, b


def _schur_solve(H: jnp.ndarray, b: jnp.ndarray, k: int, damping: float,
                 anchor: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eliminate the scale block and solve the reduced pose system.

    H [k,7,k,7], b [k,7] -> (pose deltas [k,6], scale deltas [k]).
    """
    # Split pose (first 6) / scale (last 1) blocks.
    A = H[:, :6, :, :6].reshape(6 * k, 6 * k)
    B = H[:, :6, :, 6].reshape(6 * k, k)
    C = H[:, 6, :, 6].reshape(k, k)
    b_p = b[:, :6].reshape(6 * k)
    b_s = b[:, 6].reshape(k)

    # Gauge fixing: anchor keyframe 0's pose and scale.
    mp = jnp.ones(6 * k).at[6 * anchor:6 * anchor + 6].set(0.0)
    ms = jnp.ones(k).at[anchor].set(0.0)
    A = A * mp[:, None] * mp[None, :] + jnp.diag(1.0 - mp)
    B = B * mp[:, None] * ms[None, :]
    C = C * ms[:, None] * ms[None, :] + jnp.diag(1.0 - ms)
    b_p = b_p * mp
    b_s = b_s * ms

    # Levenberg-Marquardt damping: relative to the diagonal so weakly
    # constrained directions (near-degenerate scenes) take small steps.
    A = A + damping * jnp.diag(jnp.diag(A)) + 1e-8 * jnp.eye(6 * k)
    C = C + damping * jnp.diag(jnp.diag(C)) + 1e-8 * jnp.eye(k)

    Cinv = jnp.linalg.inv(C)
    # Schur complement: reduced pose system.
    H_red = A - B @ Cinv @ B.T
    b_red = b_p - B @ (Cinv @ b_s)
    dxi = -jnp.linalg.solve(H_red, b_red)
    dsigma = -Cinv @ (b_s + B.T @ dxi)
    return (dxi * mp).reshape(k, 6), dsigma * ms


def _gn_loop(problem: BAProblem, accumulate_fn, iters: int, damping: float,
             anchor: int, max_step: float, cost_fn=None,
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The shared Gauss-Newton iteration, parameterized over how the normal
    equations are accumulated (single-device vmap or edge-sharded psum).

    With ``cost_fn`` (problem -> scalar robust cost) the loop runs as
    Levenberg-Marquardt with an accept/reject guard: a candidate step
    that raises the robust cost is discarded and the damping multiplied
    (x4), an accepted step relaxes it (x0.5, floored at the configured
    ``damping``). This makes every stage monotone in its own robust
    objective — refinement can stall, but can no longer walk the
    trajectory out of the basin (the twist-0.12/outlier-0.25 failure of
    round 4, results/ba_sweep_cpu.jsonl). Without ``cost_fn`` the loop
    is plain fixed-damping GN (the r1-r4 behavior).
    """
    k = problem.poses.shape[0]

    def candidate(poses, sigmas, lam):
        scaled = problem._replace(
            poses=poses, depths=problem.depths * jnp.exp(sigmas)[:, None, None])
        H, b = accumulate_fn(scaled)
        dxi, dsigma = _schur_solve(H, b, k, lam, anchor)
        # Trust region: clip per-keyframe twist norms so a single
        # ill-conditioned iteration cannot leave the basin.
        norm = jnp.linalg.norm(dxi, axis=-1, keepdims=True)
        dxi = dxi * jnp.minimum(1.0, max_step / jnp.maximum(norm, 1e-12))
        dsigma = jnp.clip(dsigma, -max_step, max_step)
        return poses @ se3_exp(dxi), sigmas + dsigma

    if cost_fn is None:
        def body(carry, _):
            poses, sigmas = carry
            return candidate(poses, sigmas, damping), None

        (poses, sigmas), _ = jax.lax.scan(
            body, (problem.poses, jnp.zeros(k, problem.poses.dtype)), None,
            length=iters)
        return poses, sigmas

    def lm_body(carry, _):
        poses, sigmas, lam, cost = carry
        new_poses, new_sigmas = candidate(poses, sigmas, lam)
        new_cost = cost_fn(problem._replace(
            poses=new_poses,
            depths=problem.depths * jnp.exp(new_sigmas)[:, None, None]))
        accept = new_cost <= cost
        poses = jnp.where(accept, new_poses, poses)
        sigmas = jnp.where(accept, new_sigmas, sigmas)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, damping), lam * 4.0)
        return (poses, sigmas, lam, cost), accept

    sigmas0 = jnp.zeros(k, problem.poses.dtype)
    cost0 = cost_fn(problem)
    (poses, sigmas, _, _), _ = jax.lax.scan(
        lm_body,
        (problem.poses, sigmas0, jnp.asarray(damping, problem.poses.dtype),
         cost0),
        None, length=iters)
    return poses, sigmas


@partial(jax.jit, static_argnames=("stride", "iters", "anchor", "robust_c",
                                   "max_step", "lm_guard"))
def optimize_dense_ba(problem: BAProblem, stride: int = 4, iters: int = 8,
                      damping: float = 1e-2, anchor: int = 0,
                      robust_c: float = 0.25, max_step: float = 0.05,
                      lm_guard: bool = True,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton dense BA. Returns (refined poses [K,4,4],
    log-scales [K]).

    ``lm_guard`` enables the Levenberg-Marquardt accept/reject loop
    (monotone robust cost — see `_gn_loop`); disable for the raw
    fixed-damping GN iteration.

    Matmul precision is pinned to fp32: TPU matmuls default to bf16 inputs,
    whose ~2^-8 relative error in the projection chain and J^T J products
    is larger than the converged residuals — measured to turn convergence
    (5x ATE drop on CPU) into divergence on TPU v5e."""
    with jax.default_matmul_precision("highest"):
        return _gn_loop(problem, lambda p: _accumulate(p, stride, robust_c),
                        iters, damping, anchor, max_step,
                        cost_fn=(lambda p: _total_cost(p, stride, robust_c))
                        if lm_guard else None)


def make_sharded_optimizer(mesh, stride: int = 4, iters: int = 8,
                           damping: float = 1e-2, anchor: int = 0,
                           robust_c: float = 0.25, max_step: float = 0.05,
                           lm_guard: bool = True):
    """Full distributed dense BA: the same GN/Schur loop as
    `optimize_dense_ba` with every iteration's residual/Jacobian work
    edge-sharded over the mesh's ``data`` axis (psum-assembled system,
    replicated tiny solve; with ``lm_guard`` the per-iteration robust
    cost is likewise edge-sharded and psum-reduced). The sharded and
    single-device optimizers are bit-compatible up to reduction order —
    asserted in `tests/test_ba.py::test_sharded_optimizer_matches_single_device`
    and the multi-chip dryrun."""
    accumulate = make_sharded_accumulate(mesh, stride, robust_c)
    cost_fn = (make_sharded_cost(mesh, stride, robust_c)
               if lm_guard else None)

    @jax.jit
    def run(problem: BAProblem) -> Tuple[jnp.ndarray, jnp.ndarray]:
        with jax.default_matmul_precision("highest"):  # see optimize_dense_ba
            return _gn_loop(problem, accumulate, iters, damping, anchor,
                            max_step, cost_fn=cost_fn)

    return run


def pool_depth(depths: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Valid-aware average pooling of [K,h,w] depth maps by ``factor``.

    Zeros (invalid depth) are excluded from the average instead of
    dragging it toward the camera; a cell with no valid taps stays 0.
    """
    if factor == 1:
        return depths
    k, h, w = depths.shape
    hh, ww = h // factor, w // factor
    d = depths[:, :hh * factor, :ww * factor].reshape(
        k, hh, factor, ww, factor)
    valid = (d > 0).astype(depths.dtype)
    s = (d * valid).sum(axis=(2, 4))
    c = valid.sum(axis=(2, 4))
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


# A continuation stage: (depth pyramid factor, IRLS robust_c, GN iters,
# trust-region max_step).
Stage = Tuple[int, float, int, float]

# Graduated non-convexity (GNC): start near-quadratic (large robust_c =
# wide basin, outliers still pull), finish sharply robust. MEASURED to be
# the basin widener on the wavy-trajectory benchmark: at twist noise
# sigma=0.12 / outliers 0.25 — where single-level GN diverges or stalls
# (0.4-1.7x ATE) — this schedule recovers 5-6.5x ATE reduction on most
# seeds (docs/ba_results_r4.md). Beyond ~0.2 twist the failure is data
# association, a graph-level problem (ba/pose_graph.py), not continuation.
GNC_STAGES: Tuple[Stage, ...] = (
    (1, 2.0, 10, 0.3), (1, 0.5, 10, 0.15), (1, 0.25, 10, 0.1))

# Depth-pyramid coarse-to-fine. Implemented and verified equivalent at
# factor 1, but measured NOT to widen the basin on the wavy benchmark
# (pooling biases the geometry itself rather than smoothing the cost —
# the residual IS geometry here, unlike image-intensity pyramids); it
# remains useful as a cost reducer: coarse stages run on f^2-fold fewer
# residuals. Prefer GNC_STAGES for robustness.
C2F_STAGES: Tuple[Stage, ...] = (
    (4, 0.25, 8, 0.1), (2, 0.25, 8, 0.1), (1, 0.25, 8, 0.1))


def optimize_dense_ba_scheduled(problem: BAProblem,
                                stages: Tuple[Stage, ...] = GNC_STAGES,
                                stride: int = 2, damping: float = 1e-2,
                                anchor: int = 0, mesh=None,
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Continuation dense BA: the GN/Schur loop over a stage schedule.

    Each stage ``(factor, robust_c, iters, max_step)`` runs ``iters`` GN
    iterations on ``pool_depth(depths, factor)`` (intrinsics scaled to
    match, repo pixel-center convention) with the given IRLS threshold
    and trust region, starting from the previous stage's estimate. Two
    shipped schedules: `GNC_STAGES` (graduated non-convexity — anneal
    robust_c; widens the basin ~2x in twist noise, measured) and
    `C2F_STAGES` (depth pyramid — cheaper coarse iterations).

    Log depth-scale corrections accumulate across stages (each stage's
    solve sees depths pre-scaled by the running estimate). With ``mesh``
    every stage's residual/Jacobian work runs edge-sharded
    (`make_sharded_optimizer`). Returns (refined poses [K,4,4],
    accumulated log-scales [K]).
    """
    from dro_sfm_tpu.geometry.camera import scale_intrinsics

    k = problem.poses.shape[0]
    poses = problem.poses
    sigma = jnp.zeros(k, problem.poses.dtype)
    for factor, robust_c, iters, max_step in stages:
        K_f = (scale_intrinsics(problem.K, 1.0 / factor)
               if factor > 1 else problem.K)
        level = problem._replace(
            poses=poses,
            depths=pool_depth(problem.depths, factor)
            * jnp.exp(sigma)[:, None, None],
            K=K_f.astype(problem.K.dtype))
        if mesh is not None:
            run = make_sharded_optimizer(
                mesh, stride=stride, iters=iters, damping=damping,
                anchor=anchor, robust_c=robust_c, max_step=max_step)
            poses, ds = run(level)
        else:
            poses, ds = optimize_dense_ba(
                level, stride=stride, iters=iters, damping=damping,
                anchor=anchor, robust_c=robust_c, max_step=max_step)
        sigma = sigma + ds
    return poses, sigma


def optimize_dense_ba_c2f(problem: BAProblem,
                          levels: Tuple[int, ...] = (4, 2, 1),
                          iters: int = 8, stride: int = 2,
                          damping: float = 1e-2, anchor: int = 0,
                          robust_c: float = 0.25, max_step: float = 0.1,
                          mesh=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-pyramid coarse-to-fine preset of
    `optimize_dense_ba_scheduled` (see `C2F_STAGES` for when to prefer
    it)."""
    stages = tuple((f, robust_c, iters, max_step) for f in levels)
    return optimize_dense_ba_scheduled(problem, stages, stride=stride,
                                       damping=damping, anchor=anchor,
                                       mesh=mesh)


def make_sharded_cost(mesh, stride: int, robust_c: float = 0.0):
    """Edge-sharded robust-cost evaluation (the LM guard's objective),
    psum-reduced over the ``data`` axis — same sharding contract as
    `make_sharded_accumulate`."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def local(poses, depths, K, edges_i, edges_j):
        problem = BAProblem(poses, depths, K, edges_i, edges_j)
        return jax.lax.psum(_total_cost(problem, stride, robust_c),
                            axis_name="data")

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(), P("data"), P("data")),
                   out_specs=P())

    def run(problem: BAProblem):
        return fn(problem.poses, problem.depths, problem.K,
                  problem.edges_i, problem.edges_j)

    return run


# Two-frame alignment continuation: (robust_c, iters, max_step). A long
# wide-kernel stage first — measured to cut diverged edges 34% -> 15% at
# twist 0.12 vs a short sharp-kernel schedule (docs/ba_results_r5.md) —
# then a sharp polish for inlier accuracy.
EDGE_STAGES: Tuple[Tuple[float, int, float], ...] = (
    (2.0, 30, 0.5), (0.25, 8, 0.15))


@partial(jax.jit, static_argnames=("stride", "stages"))
def estimate_edge_relatives(problem: BAProblem, stride: int = 2,
                            damping: float = 1e-2,
                            stages: Tuple[Tuple[float, int, float], ...]
                            = EDGE_STAGES,
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Independent two-frame alignment per covisibility edge.

    For each edge (i, j), holds frame i fixed and Gauss-Newton-refines
    frame j's 6-DoF pose + log depth scale against the dense
    depth-consistency residual — a [7,7] solve per edge, all edges
    vmapped, over the ``stages`` (robust_c, iters, max_step)
    continuation. Returns (measurements Z_ij [E,4,4] = refined
    T_i^{-1} T_j, weights [E] = valid-pixel fraction x
    1/(1 + mean robust residual)).

    This is the classic front-end/back-end split: per-edge relative
    poses are a LOCAL problem whose basin does not shrink as global
    trajectory noise grows, so feeding them to pose-graph optimization
    (`ba/pose_graph.py`) re-initializes dense BA inside its basin at
    noise levels where joint GN diverges (twist sigma >= 0.12,
    results/ba_sweep_cpu.jsonl r4 rows).
    """
    zero = jnp.zeros(7, problem.poses.dtype)

    def refine_one(T_i, T_j, D_i, D_j):
        def make_body(robust_c, max_step):
            def body(carry, _):
                T_cur, sig = carry
                fn = lambda pj: _edge_residual(   # noqa: E731
                    zero, pj, T_i, T_cur, D_i, D_j * jnp.exp(sig),
                    problem.K, stride)
                r = fn(zero)
                J = jax.jacfwd(fn)(zero)
                if robust_c > 0:
                    w = jnp.sqrt(1.0 / (1.0 + (r / robust_c) ** 2))
                    r = r * w
                    J = J * w[:, None]
                H = J.T @ J
                H = H + damping * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7)
                d = -jnp.linalg.solve(H, J.T @ r)
                norm = jnp.linalg.norm(d[:6])
                d = d.at[:6].multiply(
                    jnp.minimum(1.0, max_step / jnp.maximum(norm, 1e-12)))
                # Incremental composition (right-multiplied twist,
                # additive log-scale) — matches _edge_residual's
                # params_j semantics.
                return (T_cur @ se3_exp(d[:6]),
                        sig + jnp.clip(d[6], -max_step, max_step)), None
            return body

        carry = (T_j, jnp.zeros((), T_i.dtype))
        for robust_c, iters, max_step in stages:
            carry, _ = jax.lax.scan(make_body(robust_c, max_step), carry,
                                    None, length=iters)
        T_j_ref, sig = carry
        r = _edge_residual(zero, zero, T_i, T_j_ref, D_i,
                           D_j * jnp.exp(sig), problem.K, stride)
        valid_frac = (jnp.abs(r) > 0).mean()
        weight = valid_frac / (1.0 + (jnp.abs(r).sum()
                                      / jnp.maximum((jnp.abs(r) > 0).sum(),
                                                    1.0)) / 0.01)
        return jnp.linalg.inv(T_i) @ T_j_ref, weight

    with jax.default_matmul_precision("highest"):
        return jax.vmap(refine_one)(
            problem.poses[problem.edges_i], problem.poses[problem.edges_j],
            problem.depths[problem.edges_i],
            problem.depths[problem.edges_j])


def optimize_dense_ba_robust(problem: BAProblem,
                             stages: Tuple[Stage, ...] = None,
                             stride: int = 2, damping: float = 1e-2,
                             anchor: int = 0, mesh=None,
                             pgo_iters: int = 15,
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full robust pipeline: per-edge alignment -> pose-graph -> dense BA.

    1. `estimate_edge_relatives`: local two-frame refinements (basin
       independent of global noise).
    2. `optimize_pose_graph` on the measured relatives — re-initializes
       the trajectory near the global optimum.
    3. The GNC-scheduled dense BA (LM-guarded) polishes poses + scales
       jointly from the re-initialized trajectory.

    The dense stages are monotone in their robust cost (LM guard), so
    the full pipeline returns a trajectory no worse than the PGO
    initialization under its own objective — the "refinement must not
    make it worse" contract (VERDICT r4 item 6).
    """
    from dro_sfm_tpu.ba.pose_graph import optimize_pose_graph

    measurements, weights = estimate_edge_relatives(
        problem, stride=stride, damping=damping)
    # Robust (IRLS-Cauchy) PGO: diverged two-frame alignments produce
    # measurement outliers 10-50x the inlier error scale; c = 0.15 sits
    # ~3x above the measured inlier median (docs/ba_results_r5.md).
    poses = optimize_pose_graph(problem.poses, problem.edges_i,
                                problem.edges_j, measurements,
                                weights=weights, iters=pgo_iters,
                                anchor=anchor, robust_c=0.15)
    reinit = problem._replace(poses=poses)
    return optimize_dense_ba_scheduled(
        reinit, stages=GNC_STAGES if stages is None else stages,
        stride=stride, damping=damping, anchor=anchor, mesh=mesh)


def make_sharded_accumulate(mesh, stride: int, robust_c: float = 0.0):
    """Edge-sharded normal-equation accumulation via shard_map + psum.

    Returns a function (problem) -> (H, b) where the per-edge residual and
    Jacobian work is partitioned over the mesh's ``data`` axis and the
    global system is assembled with an all-reduce — the distributed-BA
    communication pattern (keyframe state replicated, edge work sharded).
    Edge count must be divisible by the axis size (pad with weight-0
    self-edges if needed).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def local(poses, depths, K, edges_i, edges_j):
        problem = BAProblem(poses, depths, K, edges_i, edges_j)
        H, b = _accumulate(problem, stride, robust_c)
        return (jax.lax.psum(H, axis_name="data"),
                jax.lax.psum(b, axis_name="data"))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data")),
        out_specs=(P(), P()))

    def run(problem: BAProblem):
        return fn(problem.poses, problem.depths, problem.K,
                  problem.edges_i, problem.edges_j)

    return run
