"""bf16 hash-table compute path (tcnn-style fp16-class tables).

The master param stays f32; the table is cast to bf16 before the dominant
gather. Checks: forward close to f32 path, grads flow to the f32 param,
jacobian (want_jac) path works, and the Adam accumulation dtype is f32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfstudio_tpu.ops.encodings import HashEncoding


def _enc(dtype):
    return HashEncoding(
        num_levels=4, min_res=4, max_res=64, log2_hashmap_size=10,
        features_per_level=2, table_dtype=dtype,
    )


def test_bf16_forward_matches_f32():
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 3))
    enc32, enc16 = _enc("float32"), _enc("bfloat16")
    params = enc32.init(jax.random.PRNGKey(1), x)
    out32 = enc32.apply(params, x)
    out16 = enc16.apply(params, x)
    assert out16.dtype == jnp.float32  # outputs come back f32
    # table init scale is 1e-4, bf16 has ~3 decimal digits
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out16),
                               rtol=2e-2, atol=1e-6)


def test_bf16_grads_flow_to_f32_param():
    x = jax.random.uniform(jax.random.PRNGKey(0), (32, 3))
    enc = _enc("bfloat16")
    params = enc.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    gt = g["params"]["hash_table"]
    assert gt.dtype == jnp.float32  # master param grad is f32
    assert float(jnp.sum(jnp.abs(gt))) > 0.0

    # grad direction matches the f32 path
    g32 = jax.grad(lambda p: jnp.sum(_enc("float32").apply(p, x) ** 2))(params)
    a = np.asarray(gt).ravel()
    b = np.asarray(g32["params"]["hash_table"]).ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.99


def test_bf16_want_jac():
    x = jax.random.uniform(jax.random.PRNGKey(0), (16, 3))
    enc = _enc("bfloat16")
    params = enc.init(jax.random.PRNGKey(1), x)
    out, jac = enc.apply(params, x, want_jac=True)
    assert jac.shape == (16, enc.out_dim, 3)
    assert jnp.all(jnp.isfinite(jac))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_table_dtype_trains(dtype):
    import optax

    x = jax.random.uniform(jax.random.PRNGKey(0), (256, 3))
    target = jnp.sin(8.0 * x[:, 0]) * jnp.cos(5.0 * x[:, 1])
    enc = _enc(dtype)
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

    for _ in range(60):
        params, state, l = step(params, state)
    assert float(l) < 0.5 * l0
