"""SDF -> density / alpha / occupancy conversions.

Functional spec: reference nerfstudio/fields/sdf_field.py:49-118 (Laplace /
Sigmoid densities, SingleVarianceNetwork) and sdf_field.py:476-530 (NeuS
alpha, UniSurf occupancy). These are pure functions of (sdf, parameter);
the learnable scalars (beta, variance) live in the field's param pytree.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

BETA_MIN = 1e-4


def effective_beta(beta_param: jnp.ndarray, beta_min: float = BETA_MIN) -> jnp.ndarray:
    """beta = |beta_param| + beta_min  (reference sdf_field.py:68-71)."""
    return jnp.abs(beta_param) + beta_min


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """VolSDF: alpha * Laplace(0, beta).cdf(-sdf) with alpha = 1/beta
    (reference sdf_field.py:49-66)."""
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def sigmoid_density(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid density variant (reference sdf_field.py:74-93)."""
    alpha = 1.0 / beta
    return alpha * jax.nn.sigmoid(-sdf * alpha)


def variance_inv_s(variance_param: jnp.ndarray) -> jnp.ndarray:
    """NeuS single-variance network: inv_s = exp(10 * var), clipped
    (reference sdf_field.py:101-118)."""
    return jnp.clip(jnp.exp(variance_param * 10.0), 1e-6, 1e6)


def neus_alpha(
    sdf: jnp.ndarray,  # [..., S]
    gradients: jnp.ndarray,  # [..., S, 3]
    directions: jnp.ndarray,  # [..., 3] or [..., S, 3]
    deltas: jnp.ndarray,  # [..., S]
    inv_s: jnp.ndarray,  # scalar
    cos_anneal_ratio: jnp.ndarray,  # scalar in [0, 1]
) -> jnp.ndarray:
    """NeuS opacity from the sigmoid-CDF ratio with cosine annealing
    (reference sdf_field.py:476-525)."""
    if directions.ndim < gradients.ndim:
        directions = directions[..., None, :]
    true_cos = jnp.sum(directions * gradients, axis=-1)

    # The anneal keeps cos "not dead" early in training (sdf_field.py:501-505).
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )  # always non-positive

    estimated_next_sdf = sdf + iter_cos * deltas * 0.5
    estimated_prev_sdf = sdf - iter_cos * deltas * 0.5

    prev_cdf = jax.nn.sigmoid(estimated_prev_sdf * inv_s)
    next_cdf = jax.nn.sigmoid(estimated_next_sdf * inv_s)

    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    return jnp.clip(alpha, 0.0, 1.0)


def neus_alpha_fixed_inv_s(
    sdf: jnp.ndarray,  # [R, S] sdf at the S bin starts (S = num bins used)
    deltas: jnp.ndarray,  # [R, S-1] deltas between consecutive starts
    inv_s: float,
) -> jnp.ndarray:
    """Alpha with inv_s fixed and cos estimated from finite differences,
    robustified by min(prev_cos, cos) — the NeuS hierarchical upsampling rule
    (reference ray_samplers.py:909-944). Returns [R, S-1]."""
    prev_sdf, next_sdf = sdf[..., :-1], sdf[..., 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (deltas + 1e-5)

    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[..., :1]), cos_val[..., :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0)

    prev_esti = mid_sdf - cos_val * deltas * 0.5
    next_esti = mid_sdf + cos_val * deltas * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    return (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)


def unisurf_occupancy(sdf: jnp.ndarray) -> jnp.ndarray:
    """UniSurf occupancy = sigmoid(-10 * sdf)  (reference sdf_field.py:527-530)."""
    return jax.nn.sigmoid(-10.0 * sdf)


@jax.custom_jvp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp(x) with the backward pass computed from clamp(x, -15, 15) to
    prevent exploding gradients — the instant-ngp density activation
    (reference field_components/activations.py:24-40)."""
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    return jnp.exp(x), t * jnp.exp(jnp.clip(x, -15.0, 15.0))
