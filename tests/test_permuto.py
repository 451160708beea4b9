"""Permutohedral-lattice encoding (ops/permuto.py, PermutoSDF).

Validates the lattice math (simplex identification, barycentric weights),
the analytic jacobian, gradient flow through the shared table_gather path,
the halved access count vs the cubic hash, and SDFField integration.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfstudio_tpu.ops.permuto import ELEVATE, PermutoEncoding, _simplex


def _rand_x(n, key=0, scale=1.0):
    return scale * jax.random.uniform(jax.random.PRNGKey(key), (n, 3))


def test_elevation_on_hyperplane():
    x = np.asarray(_rand_x(128))
    elev = x @ ELEVATE.T
    np.testing.assert_allclose(elev.sum(-1), 0.0, atol=1e-4)


def test_simplex_invariants():
    elev = jnp.asarray(np.asarray(_rand_x(512, scale=37.0)) @ ELEVATE.T)
    rem0, rank, w = _simplex(elev)
    # corrected remainder-0 point: multiples of 4, coords sum to 0
    np.testing.assert_allclose(np.asarray(rem0) % 4.0, 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rem0).sum(-1), 0.0, atol=1e-3)
    # rank is a permutation of 0..3
    r = np.sort(np.asarray(rank), axis=-1)
    np.testing.assert_array_equal(r, np.broadcast_to(np.arange(4), r.shape))
    # barycentric: sum to 1, non-negative
    wn = np.asarray(w)
    np.testing.assert_allclose(wn.sum(-1), 1.0, atol=1e-4)
    assert wn.min() > -1e-4


def _enc(**kw):
    cfg = dict(num_levels=4, min_res=4, max_res=32, log2_hashmap_size=12,
               features_per_level=2)
    cfg.update(kw)
    return PermutoEncoding(**cfg)


def test_four_corners_half_the_accesses():
    enc = _enc()
    x = _rand_x(16)
    idx, w, _ = enc.corner_data(x)
    assert idx.shape == (16, 4, 4)  # [N, L, 4 corners] — cubic would be 8
    assert w.shape == (16, 4, 4)
    assert idx.dtype == jnp.int32
    assert int(jnp.min(idx)) >= 0 and int(jnp.max(idx)) < enc.total_rows


def test_encoding_is_continuous():
    enc = _enc()
    params = enc.init(jax.random.PRNGKey(1), _rand_x(4))
    x = _rand_x(256, key=3)
    eps = 1e-5
    dx = jax.random.normal(jax.random.PRNGKey(4), x.shape)
    dx = dx / jnp.linalg.norm(dx, axis=-1, keepdims=True)
    a = enc.apply(params, x)
    b = enc.apply(params, x + eps * dx)
    # piecewise-linear with bounded slope (max res 32): |df| <= C * eps
    assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_jacobian_matches_finite_differences():
    enc = _enc()
    params = enc.init(jax.random.PRNGKey(1), _rand_x(4))
    # keep points away from simplex boundaries by rejecting near-tie weights
    x = _rand_x(64, key=7)
    out, jac = enc.apply(params, x, want_jac=True)
    _, w, _ = enc.corner_data(x)
    interior = np.asarray(jnp.min(w, axis=(-1, -2))) > 0.05  # all levels interior
    eps = 1e-4
    for a in range(3):
        xp = x.at[:, a].add(eps)
        xm = x.at[:, a].add(-eps)
        fd = (enc.apply(params, xp) - enc.apply(params, xm)) / (2 * eps)
        err = np.asarray(jnp.abs(fd - jac[..., a]))[interior]
        assert err.max() < 5e-2, f"axis {a}: max err {err.max()}"


def test_grads_flow_and_toy_fit():
    import optax

    x = _rand_x(256, key=9)
    target = jnp.sin(6.0 * x[:, 0]) * jnp.cos(4.0 * x[:, 2])
    enc = _enc(num_levels=6, max_res=64)
    params = enc.init(jax.random.PRNGKey(1), x)
    head = jax.random.normal(jax.random.PRNGKey(2), (enc.out_dim,)) * 0.1

    def loss(p):
        return jnp.mean((enc.apply(p, x) @ head - target) ** 2)

    tx = optax.adam(1e-2)
    state = tx.init(params)
    l0 = float(loss(params))

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss)(p)
        u, s = tx.update(g, s)
        return optax.apply_updates(p, u), s, l

    for _ in range(80):
        params, state, l = step(params, state)
    assert float(l) < 0.3 * l0


def test_bf16_table_variant():
    enc32, enc16 = _enc(), _enc(table_dtype="bfloat16")
    x = _rand_x(32)
    params = enc32.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(enc32.apply(params, x)), np.asarray(enc16.apply(params, x)),
        rtol=2e-2, atol=1e-6,
    )


def test_sdf_field_permuto_integration():
    from sdfstudio_tpu.fields.sdf_field import SDFField, SDFFieldConfig

    cfg = SDFFieldConfig(
        use_grid_feature=True,
        encoding_type="permuto",
        num_layers=2,
        hidden_dim=32,
        geo_feat_dim=15,
        num_layers_color=2,
        hidden_dim_color=32,
        num_levels=4,
        max_res=64,
        log2_hashmap_size=12,
    )
    field = SDFField(cfg)
    params = field.init(jax.random.PRNGKey(0))
    x = _rand_x(32, key=5) * 2.0 - 1.0
    sdf = field.sdf_fn(params)(x)
    assert sdf.shape == (32,)
    assert bool(jnp.all(jnp.isfinite(sdf)))
    # eikonal-style input gradients through the analytic-jac path
    g = field.gradient(params, x)
    assert g.shape == (32, 3)
    assert bool(jnp.all(jnp.isfinite(g)))
