"""Unit tests for the fused Pallas MLP kernel (ops/pallas_mlp.py).

Runs in interpreter mode on the CPU test mesh; numerics must match the plain
matmul chain exactly in forward and to f32 tolerance in reverse mode.
"""
import jax
import jax.numpy as jnp
import pytest

from sdfstudio_tpu.ops.mlp import MLP
from sdfstudio_tpu.ops.pallas_mlp import fused_mlp


def _ref_chain(x, ws, bs, act, out_act=None):
    h = x
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = h @ w + b
        if i < len(ws) - 1:
            h = act(h)
        elif out_act is not None:
            h = out_act(h)
    return h


@pytest.mark.parametrize("shape", [(37, 19), (4, 33, 3)])
@pytest.mark.parametrize("act", ["relu", "softplus100"])
def test_fused_mlp_forward(shape, act):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    d_in, h, d_out = shape[-1], 64, 5
    ws = [
        jax.random.normal(ks[0], (d_in, h)) * 0.3,
        jax.random.normal(ks[1], (h, h)) * 0.3,
        jax.random.normal(ks[2], (h, d_out)) * 0.3,
    ]
    bs = [
        jax.random.normal(ks[3], (h,)) * 0.1,
        jax.random.normal(ks[4], (h,)) * 0.1,
        jax.random.normal(ks[5], (d_out,)) * 0.1,
    ]
    x = jax.random.normal(ks[6], shape)
    from sdfstudio_tpu.ops.mlp import softplus_beta100

    act_fn = jax.nn.relu if act == "relu" else softplus_beta100
    y = fused_mlp(x, ws, bs, activation=act, block_rows=32)
    y_ref = _ref_chain(x, ws, bs, act_fn)
    assert y.shape == (*shape[:-1], d_out)
    assert jnp.max(jnp.abs(y - y_ref)) < 1e-5


def test_fused_mlp_grads_match():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 7)
    d_in, h, d_out = 16, 64, 4
    ws = tuple(
        jax.random.normal(k, s) * 0.3
        for k, s in zip(ks[:3], [(d_in, h), (h, h), (h, d_out)])
    )
    bs = tuple(
        jax.random.normal(k, (s,)) * 0.1 for k, s in zip(ks[3:6], [h, h, d_out])
    )
    x = jax.random.normal(ks[6], (40, d_in))

    def loss_fused(x, ws, bs):
        return jnp.sum(jnp.sin(fused_mlp(x, ws, bs, activation="relu", block_rows=8)))

    def loss_ref(x, ws, bs):
        return jnp.sum(jnp.sin(_ref_chain(x, ws, bs, jax.nn.relu)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert jnp.max(jnp.abs(a - b)) < 1e-4


def test_mlp_module_fused_matches_plain():
    """MLP(fused=True) and MLP(fused=False) share one param tree and agree."""
    x = jax.random.normal(jax.random.PRNGKey(2), (30, 24))
    plain = MLP(num_layers=3, layer_width=64, out_dim=6, fused=False)
    fused = MLP(num_layers=3, layer_width=64, out_dim=6, fused=True)
    params = plain.init(jax.random.PRNGKey(3), x)
    y1 = plain.apply(params, x)
    y2 = fused.apply(params, x)
    assert jnp.max(jnp.abs(y1 - y2)) < 1e-5

    g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert jnp.max(jnp.abs(a - b)) < 1e-4


def test_mlp_skip_connections_fall_back():
    """Skip-connection MLPs can't fuse; fused=True must still be correct."""
    x = jax.random.normal(jax.random.PRNGKey(4), (12, 10))
    m = MLP(num_layers=5, layer_width=32, out_dim=3, skip_connections=(2,))
    params = m.init(jax.random.PRNGKey(5), x)
    y_plain = m.apply(params, x)
    m_f = MLP(num_layers=5, layer_width=32, out_dim=3, skip_connections=(2,), fused=True)
    y_fused_flag = m_f.apply(params, x)
    assert jnp.max(jnp.abs(y_plain - y_fused_flag)) < 1e-6
