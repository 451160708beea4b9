"""Golden-value tests for volume rendering math.

The reference formulas (nerfstudio/cameras/rays.py:131-230) are the spec;
expected values are computed independently with numpy.
"""
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.ops import density as D
from sdfstudio_tpu.ops import render as R


def test_weights_from_densities_matches_quadrature():
    rng = np.random.RandomState(0)
    deltas = rng.uniform(0.01, 0.1, size=(4, 16)).astype(np.float32)
    dens = rng.uniform(0.0, 5.0, size=(4, 16)).astype(np.float32)

    weights, trans = R.weights_and_transmittance_from_densities(
        jnp.asarray(deltas), jnp.asarray(dens)
    )
    # independent numpy computation
    dd = deltas * dens
    alphas = 1 - np.exp(-dd)
    T = np.exp(-np.cumsum(np.concatenate([np.zeros((4, 1)), dd[:, :-1]], axis=1), axis=1))
    np.testing.assert_allclose(np.asarray(weights), alphas * T, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(trans), T, rtol=1e-5)
    # weights sum <= 1
    assert np.all(np.asarray(weights).sum(-1) <= 1.0 + 1e-5)


def test_weights_from_alphas_cumprod_form():
    rng = np.random.RandomState(1)
    alphas = rng.uniform(0, 1, size=(3, 8)).astype(np.float32)
    weights, trans = R.weights_and_transmittance_from_alphas(jnp.asarray(alphas))
    T = np.cumprod(np.concatenate([np.ones((3, 1)), 1 - alphas + 1e-7], axis=1), axis=1)
    np.testing.assert_allclose(np.asarray(weights), alphas * T[:, :-1], rtol=1e-5)
    assert trans.shape == (3, 9)


def test_opaque_sample_dominates():
    deltas = jnp.ones((1, 5)) * 0.1
    dens = jnp.asarray([[0.0, 0.0, 1e5, 0.0, 0.0]])
    w = R.weights_from_densities(deltas, dens)
    assert float(w[0, 2]) > 0.99
    assert float(w[0, 3]) < 1e-5  # occluded


def test_laplace_density_formula():
    beta = jnp.asarray(0.1)
    sdf = jnp.asarray([-0.5, -0.01, 0.0, 0.01, 0.5])
    d = D.laplace_density(sdf, beta)
    expected = (1 / 0.1) * (0.5 + 0.5 * np.sign(sdf) * np.expm1(-np.abs(sdf) / 0.1))
    np.testing.assert_allclose(np.asarray(d), np.asarray(expected), rtol=1e-5)
    # inside (negative sdf) -> high density; outside -> ~0
    assert d[0] > d[-1]
    assert abs(float(d[2]) - 0.5 / 0.1) < 1e-4  # at surface: alpha/2


def test_variance_inv_s():
    assert abs(float(D.variance_inv_s(jnp.asarray(0.3))) - np.exp(3.0)) < 1e-3


def test_neus_alpha_properties():
    # A ray passing front-to-back through a surface: sdf goes + -> -
    S = 16
    sdf = jnp.linspace(0.5, -0.5, S)[None, :]
    grads = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, S, 1))
    dirs = jnp.asarray([[0.0, 0.0, -1.0]])  # moving opposite to normal? ->
    # direction such that true_cos = dirs . grad < 0 (entering surface)
    deltas = jnp.ones((1, S)) * (1.0 / S)
    alpha = D.neus_alpha(sdf, grads, dirs, deltas, inv_s=jnp.asarray(64.0), cos_anneal_ratio=jnp.asarray(1.0))
    assert alpha.shape == (1, S)
    assert float(jnp.min(alpha)) >= 0.0 and float(jnp.max(alpha)) <= 1.0
    # alpha saturates inside the surface; the *weights* peak at the crossing
    weights = R.weights_from_alphas(alpha)
    peak = int(jnp.argmax(weights[0]))
    assert S // 2 - 3 <= peak <= S // 2 + 3
    # total opacity ~ 1 for a surface-crossing ray
    assert float(weights.sum()) > 0.9


def test_neus_alpha_fixed_inv_s_peak():
    S = 33
    sdf = jnp.linspace(1.0, -1.0, S)[None, :]
    deltas = jnp.ones((1, S - 1)) * (2.0 / (S - 1))
    alpha = D.neus_alpha_fixed_inv_s(sdf, deltas, inv_s=64.0)
    assert alpha.shape == (1, S - 1)
    assert float(jnp.min(alpha)) >= 0.0 and float(jnp.max(alpha)) <= 1.0 + 1e-5
    weights = R.weights_from_alphas(alpha)
    peak = int(jnp.argmax(weights[0]))
    assert (S - 1) // 2 - 4 <= peak <= (S - 1) // 2 + 4
    assert float(weights.sum()) > 0.9


def test_trunc_exp_grad_clamped():
    import jax

    g = jax.grad(lambda x: D.trunc_exp(x))(20.0)
    assert np.isfinite(g)
    assert abs(g - np.exp(15.0)) / np.exp(15.0) < 1e-5
    g2 = jax.grad(lambda x: D.trunc_exp(x))(1.0)
    np.testing.assert_allclose(g2, np.exp(1.0), rtol=1e-5)


def test_render_rgb_background_blend():
    rgb = jnp.ones((2, 4, 3)) * 0.5
    weights = jnp.zeros((2, 4))
    out = R.render_rgb(rgb, weights, background_color="white")
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_render_depth_median_and_expected():
    starts = jnp.linspace(0, 1, 9)[None, :-1].repeat(1, axis=0)
    ends = jnp.linspace(0, 1, 9)[None, 1:]
    weights = jnp.zeros((1, 8)).at[0, 4].set(1.0)
    d_med = R.render_depth_median(weights, starts, ends)
    d_exp = R.render_depth_expected(weights, starts, ends)
    mid = (starts[0, 4] + ends[0, 4]) / 2
    np.testing.assert_allclose(float(d_med[0, 0]), float(mid), atol=1e-6)
    np.testing.assert_allclose(float(d_exp[0, 0]), float(mid), atol=1e-5)
