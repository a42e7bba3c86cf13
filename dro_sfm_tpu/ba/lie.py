"""SE(3) Lie-group helpers for bundle adjustment (pure jnp).

exp/log maps and small-perturbation composition used by the Gauss-Newton
optimizers in `dro_sfm_tpu.ba`. Conventions: twists xi = [rho | phi]
(translation first, rotation second — matching the repo's 6-DoF layout).

All maps are differentiable at the identity: angle guards use the
squared-norm double-`where` pattern so autodiff never touches a
`sqrt(0)`/`1/0` branch (Gauss-Newton evaluates Jacobians exactly at zero
twists, where naive implementations produce NaN gradients).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator [..., 3] -> [..., 3, 3]."""
    zeros = jnp.zeros_like(phi[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -phi[..., 2], phi[..., 1]], axis=-1),
        jnp.stack([phi[..., 2], zeros, -phi[..., 0]], axis=-1),
        jnp.stack([-phi[..., 1], phi[..., 0], zeros], axis=-1),
    ], axis=-2)


def _safe_theta(phi: jnp.ndarray):
    """(theta [...,1,1], small-mask) with NaN-free gradients at phi = 0."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta_sq < 1e-10
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    return theta, theta_sq, small


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: so(3) [..., 3] -> SO(3) [..., 3, 3], Taylor-safe."""
    theta, theta_sq, small = _safe_theta(phi)
    K = hat(phi)
    K2 = K @ K
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) [..., 3, 3] -> so(3) [..., 3], atan2-based and NaN-free at I."""
    # w = sin(theta) * axis
    w = 0.5 * jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                         R[..., 0, 2] - R[..., 2, 0],
                         R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)[..., None]
    w_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    small = w_sq < 1e-10
    sin_theta = jnp.sqrt(jnp.where(small, 1.0, w_sq))
    theta = jnp.arctan2(sin_theta, cos_theta)
    # log = theta / sin(theta) * w; near zero, theta/sin -> 1 + theta^2/6
    scale = jnp.where(small, 1.0 + w_sq / 6.0, theta / sin_theta)
    return scale * w


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist [..., 6] = [rho | phi] -> SE(3) [..., 4, 4].

    Uses the left-Jacobian V so exp is exact.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    theta, theta_sq, small = _safe_theta(phi)
    K = hat(phi)
    K2 = K @ K
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq))
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta))
                  / jnp.where(small, 1.0, theta_sq * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b * K + c * K2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], xi.dtype), (*xi.shape[:-1], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) [..., 4, 4] -> twist [..., 6] = [rho | phi]."""
    phi = so3_log(T[..., :3, :3])
    theta, theta_sq, small = _safe_theta(phi)
    K = hat(phi)
    K2 = K @ K
    # V^{-1} = I - K/2 + coef * K^2
    # coef = (1 - theta cos(theta/2) / (2 sin(theta/2))) / theta^2
    half = 0.5 * theta
    cot_term = jnp.where(
        small, 1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half)))
        / jnp.where(small, 1.0, theta_sq))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + cot_term * K2
    rho = jnp.einsum("...ij,...j->...i", Vinv, T[..., :3, 3])
    return jnp.concatenate([rho, phi], axis=-1)
