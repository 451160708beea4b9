"""Lie group exponential maps for pose deltas.

Functional spec: reference nerfstudio/cameras/lie_groups.py:27-115
(exp_map_SO3xR3, exp_map_SE3). Branch-free Taylor fallbacks near theta=0 so
the maps are jit- and grad-safe at the identity (where the camera optimizer
starts).
"""
from __future__ import annotations

import jax.numpy as jnp


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def _so3_exp(omega: jnp.ndarray, eps: float = 1e-2):
    """Rodrigues formula; returns (R [..., 3, 3], theta, A, B, C) with the
    standard coefficients A=sin/t, B=(1-cos)/t^2, C=(t-sin)/t^3.

    eps is deliberately large (1e-2): below it the Taylor branch is accurate
    to ~1e-9, and the clamp keeps the unselected branch's quotient-rule
    denominators ((theta_sq*theta)^2 etc.) well above the float32 underflow
    threshold — a tiny eps made them flush to zero and 0*inf-poison the
    backward pass at the identity."""
    theta_sq = jnp.sum(omega**2, axis=-1)
    safe_sq = jnp.maximum(theta_sq, eps**2)
    theta = jnp.sqrt(safe_sq)
    small = theta_sq < eps**2
    # Taylor expansions at 0
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (safe_sq * theta))
    K = _skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    R = eye + A[..., None, None] * K + B[..., None, None] * (K @ K)
    return R, theta, A, B, C


def exp_map_SO3xR3(tangent: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] (translation, rotation) -> [..., 3, 4]: rotation by Rodrigues,
    translation used directly (reference lie_groups.py:27)."""
    t = tangent[..., :3]
    omega = tangent[..., 3:]
    R, *_ = _so3_exp(omega)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def exp_map_SE3(tangent: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] se(3) tangent -> [..., 3, 4] via the full SE3 exponential
    (translation through the V matrix; reference lie_groups.py:72)."""
    t = tangent[..., :3]
    omega = tangent[..., 3:]
    R, theta, A, B, C = _so3_exp(omega)
    K = _skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    V = eye + B[..., None, None] * K + C[..., None, None] * (K @ K)
    Vt = (V @ t[..., None])[..., 0]
    return jnp.concatenate([R, Vt[..., None]], axis=-1)
