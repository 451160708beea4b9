"""Volume rendering math as pure JAX functions.

Functional spec: reference nerfstudio/cameras/rays.py:131-230 (weights,
alphas, transmittance) and nerfstudio/model_components/renderers.py:42-309
(compositing). All functions take ``[..., S]`` sample-axis arrays — no
trailing singleton channel like the torch code; compositing reduces the
``S`` axis with einsum-style sums that XLA fuses into the surrounding
elementwise work.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from sdfstudio_tpu.utils import checks


def alphas_from_densities(deltas: jnp.ndarray, densities: jnp.ndarray) -> jnp.ndarray:
    """alpha_i = 1 - exp(-delta_i * sigma_i)  (reference rays.py:131-144)."""
    return 1.0 - jnp.exp(-deltas * densities)


def weights_and_transmittance_from_densities(
    deltas: jnp.ndarray, densities: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Classic NeRF quadrature (reference rays.py:146-192).

    T_i = exp(-sum_{j<i} delta_j sigma_j); w_i = alpha_i * T_i.
    Returns (weights [..., S], transmittance [..., S]).
    """
    delta_density = deltas * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    shifted = jnp.concatenate(
        [jnp.zeros_like(delta_density[..., :1]), delta_density[..., :-1]], axis=-1
    )
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alphas * transmittance, transmittance


def weights_from_densities(deltas: jnp.ndarray, densities: jnp.ndarray) -> jnp.ndarray:
    return weights_and_transmittance_from_densities(deltas, densities)[0]


def weights_and_transmittance_from_alphas(
    alphas: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Alpha-compositing form used by NeuS/UniSurf (reference rays.py:194-230).

    T is the *inclusive-shifted* cumprod of (1 - alpha + 1e-7) with a
    leading 1, length S+1; weights use T[..., :-1].
    Returns (weights [..., S], transmittance [..., S+1]).
    """
    ones = jnp.ones_like(alphas[..., :1])
    transmittance = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alphas + 1e-7], axis=-1), axis=-1
    )
    weights = alphas * transmittance[..., :-1]
    return weights, transmittance


def weights_from_alphas(alphas: jnp.ndarray) -> jnp.ndarray:
    return weights_and_transmittance_from_alphas(alphas)[0]


# ---------------------------------------------------------------------------
# Renderers (reference renderers.py). Pure weighted reductions over S.
# ---------------------------------------------------------------------------

BACKGROUND_COLORS = {
    "white": (1.0, 1.0, 1.0),
    "black": (0.0, 0.0, 0.0),
    "last_sample": None,
    "random": None,
}


def render_rgb(
    rgb: jnp.ndarray,  # [..., S, 3]
    weights: jnp.ndarray,  # [..., S]
    background_color: str = "black",
    background_rgb: Optional[jnp.ndarray] = None,  # [..., 3] override
) -> jnp.ndarray:
    """Composite per-sample colors (reference renderers.py:42-168)."""
    checks.check_weights_values(weights, rgb, "render_rgb")
    comp = jnp.sum(weights[..., None] * rgb, axis=-2)
    accumulation = jnp.sum(weights, axis=-1, keepdims=True)
    if background_rgb is None:
        if background_color == "last_sample":
            background_rgb = rgb[..., -1, :]
        elif background_color == "none":
            return comp
        else:
            background_rgb = jnp.asarray(
                BACKGROUND_COLORS.get(background_color) or (0.0, 0.0, 0.0),
                dtype=rgb.dtype,
            )
    return comp + background_rgb * (1.0 - accumulation)


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    """[..., S] -> [..., 1]  (reference renderers.py:171-197)."""
    return jnp.sum(weights, axis=-1, keepdims=True)


def render_depth_expected(
    weights: jnp.ndarray, starts: jnp.ndarray, ends: jnp.ndarray, eps: float = 1e-10
) -> jnp.ndarray:
    """Expected (accumulation-normalized) depth (reference renderers.py:226-258)."""
    checks.check_sample_axis("render_depth_expected", weights=weights, starts=starts, ends=ends)
    steps = (starts + ends) * 0.5
    depth = jnp.sum(weights * steps, axis=-1, keepdims=True)
    depth = depth / (jnp.sum(weights, axis=-1, keepdims=True) + eps)
    return jnp.clip(depth, steps.min(axis=-1, keepdims=True), steps.max(axis=-1, keepdims=True))


def render_depth_median(weights: jnp.ndarray, starts: jnp.ndarray, ends: jnp.ndarray) -> jnp.ndarray:
    """Median depth: first step where CDF >= 0.5 (reference renderers.py:211-225)."""
    checks.check_sample_axis("render_depth_median", weights=weights, starts=starts, ends=ends)
    steps = (starts + ends) * 0.5
    cumulative = jnp.cumsum(weights, axis=-1)  # [..., S]
    split = jnp.ones_like(cumulative[..., :1]) * 0.5
    # searchsorted per ray over the cumulative weights
    idx = jnp.sum((cumulative < split).astype(jnp.int32), axis=-1, keepdims=True)
    idx = jnp.clip(idx, 0, steps.shape[-1] - 1)
    return jnp.take_along_axis(steps, idx, axis=-1)


def render_semantics(values: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted sum of arbitrary per-sample vectors (renderers.py:284-296);
    also used for normals in surface models (base_surface_model.py:216)."""
    checks.check_weights_values(weights, values, "render_semantics")
    return jnp.sum(weights[..., None] * values, axis=-2)


def render_normals(normals: jnp.ndarray, weights: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
    checks.check_weights_values(weights, normals, "render_normals")
    out = jnp.sum(weights[..., None] * normals, axis=-2)
    if normalize:
        out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-10)
    return out


def render_uncertainty(betas: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """[..., S] betas -> [..., 1] (renderers.py:264-281)."""
    checks.check_sample_axis("render_uncertainty", weights=weights, betas=betas)
    return jnp.sum(weights * betas, axis=-1, keepdims=True)
