"""Pose-graph optimization over keyframes (Gauss-Newton, mesh-shardable).

The first stage of the scale-out extension named in BASELINE.json's north
star: refine a trajectory of keyframe poses given relative-pose
measurements (from the network's sliding-window predictions, loop closures,
or GT priors).

Residual per edge (i, j): r = log( Z_ij^{-1} · T_i^{-1} · T_j ) in se(3),
where Z_ij is the measured relative transform and T_* are camera-to-world
poses. Minimized by damped Gauss-Newton with per-edge Jacobians from
forward-mode autodiff, all edges batched with vmap — on a mesh the edge
axis shards over ``data`` and the normal equations accumulate via psum
(`optimize_pose_graph_sharded`). Gauge freedom is fixed by anchoring pose 0.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from dro_sfm_tpu.ba.lie import se3_exp, se3_log


def edge_residual(xi_i: jnp.ndarray, xi_j: jnp.ndarray, T_i0: jnp.ndarray,
                  T_j0: jnp.ndarray, Z_ij: jnp.ndarray) -> jnp.ndarray:
    """Residual [6] for one edge at perturbed poses T = T0 · exp(xi)."""
    T_i = T_i0 @ se3_exp(xi_i)
    T_j = T_j0 @ se3_exp(xi_j)
    rel = jnp.linalg.inv(Z_ij) @ jnp.linalg.inv(T_i) @ T_j
    return se3_log(rel)


def _edge_system(T_i0, T_j0, Z_ij, weight):
    """(r [6], J_i [6,6], J_j [6,6]) at xi = 0 for one edge."""
    zero = jnp.zeros(6, T_i0.dtype)
    r = edge_residual(zero, zero, T_i0, T_j0, Z_ij)
    J_i = jax.jacfwd(edge_residual, argnums=0)(zero, zero, T_i0, T_j0, Z_ij)
    J_j = jax.jacfwd(edge_residual, argnums=1)(zero, zero, T_i0, T_j0, Z_ij)
    return r * weight, J_i * weight, J_j * weight


def build_normal_equations(poses: jnp.ndarray, edges_i: jnp.ndarray,
                           edges_j: jnp.ndarray, measurements: jnp.ndarray,
                           weights: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble H [6K, 6K] and b [6K] from all edges (vmapped + scattered)."""
    k = poses.shape[0]
    r, J_i, J_j = jax.vmap(_edge_system)(
        poses[edges_i], poses[edges_j], measurements, weights)

    H = jnp.zeros((k, 6, k, 6), poses.dtype)
    b = jnp.zeros((k, 6), poses.dtype)

    H = H.at[edges_i, :, edges_i, :].add(
        jnp.einsum("eai,eaj->eij", J_i, J_i))
    H = H.at[edges_j, :, edges_j, :].add(
        jnp.einsum("eai,eaj->eij", J_j, J_j))
    H = H.at[edges_i, :, edges_j, :].add(
        jnp.einsum("eai,eaj->eij", J_i, J_j))
    H = H.at[edges_j, :, edges_i, :].add(
        jnp.einsum("eai,eaj->eij", J_j, J_i))
    b = b.at[edges_i].add(jnp.einsum("eai,ea->ei", J_i, r))
    b = b.at[edges_j].add(jnp.einsum("eai,ea->ei", J_j, r))
    return H.reshape(6 * k, 6 * k), b.reshape(6 * k)


@partial(jax.jit, static_argnames=("iters", "anchor", "robust_c"))
def optimize_pose_graph(poses: jnp.ndarray, edges_i: jnp.ndarray,
                        edges_j: jnp.ndarray, measurements: jnp.ndarray,
                        weights: jnp.ndarray | None = None,
                        iters: int = 10, damping: float = 1e-6,
                        anchor: int = 0,
                        robust_c: float = 0.0) -> jnp.ndarray:
    """Damped Gauss-Newton PGO.

    poses [K,4,4] (camera->world initial estimates); edges (i, j) index
    arrays [E]; measurements [E,4,4] of T_i^{-1} T_j; returns refined poses
    [K,4,4] with pose ``anchor`` held fixed.

    ``robust_c`` > 0 enables per-iteration IRLS Cauchy reweighting on the
    edge residual NORM (w = 1/(1 + (|r|/c)^2), composed with the static
    ``weights``): front-end relative-pose measurements are contaminated
    by diverged two-frame alignments whose errors are 10-50x the inlier
    scale, and a least-squares PGO lets one such edge bend the whole
    trajectory (measured: ATE 0.20 -> 0.52 at twist 0.12/outlier 0.25,
    docs/ba_results_r5.md) while the GT-measurement run solves exactly —
    the failure is measurement outliers, not the optimizer.
    """
    if weights is None:
        weights = jnp.ones(edges_i.shape[0], poses.dtype)
    k = poses.shape[0]
    anchor_mask = jnp.ones((k, 6), poses.dtype).at[anchor].set(0.0)

    def body(poses, _):
        w = weights
        if robust_c > 0:
            zero = jnp.zeros((edges_i.shape[0], 6), poses.dtype)
            r = jax.vmap(edge_residual)(zero, zero,
                                        poses[edges_i], poses[edges_j],
                                        measurements)
            s = jnp.linalg.norm(r, axis=-1)
            w = weights / (1.0 + (s / robust_c) ** 2)
        H, b = build_normal_equations(poses, edges_i, edges_j,
                                      measurements, w)
        # Gauge fixing: zero out the anchor's rows/cols, identity on diag.
        m = anchor_mask.reshape(-1)
        H = H * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        b = b * m
        H = H + damping * jnp.eye(6 * k, dtype=poses.dtype)
        delta = -jnp.linalg.solve(H, b).reshape(k, 6)
        # Zero the anchor's twist explicitly (gauge freedom).
        new_poses = poses @ se3_exp(delta * anchor_mask)
        return new_poses, None

    poses, _ = jax.lax.scan(body, poses, None, length=iters)
    return poses


def total_edge_error(poses, edges_i, edges_j, measurements) -> jnp.ndarray:
    """Sum of squared edge residual norms (convergence diagnostic)."""
    zero = jnp.zeros((edges_i.shape[0], 6), poses.dtype)
    r = jax.vmap(edge_residual)(zero, zero, poses[edges_i], poses[edges_j],
                                measurements)
    return (r ** 2).sum()
