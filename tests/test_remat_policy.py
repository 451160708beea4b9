"""SST_REMAT_POLICY selects the field-core remat strategy (memory vs
recompute for large-batch runs, docs/tpu-design.md) — gradients must be
value-identical across policies, verified through the real
jax.checkpoint(core) call site (SDFField.get_outputs)."""
import numpy as np
import pytest


def _grad_with(monkeypatch, mode):
    monkeypatch.setenv("SST_REMAT_POLICY", mode)
    import jax
    import jax.numpy as jnp

    from sdfstudio_tpu.core.rays import RaySamples
    from sdfstudio_tpu.fields import sdf_field as sf

    cfg = sf.SDFFieldConfig(num_layers=2, hidden_dim=32, geo_feat_dim=15,
                            num_layers_color=2, hidden_dim_color=32,
                            use_grid_feature=True, num_levels=2, max_res=32,
                            base_res=16, log2_hashmap_size=9)
    field = sf.SDFField(cfg, num_images=2)
    params = field.init(jax.random.PRNGKey(0))
    R, S = 8, 6
    o = jnp.zeros((R, 3)).at[:, 2].set(-2.0)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    t = jnp.linspace(1.2, 2.8, S + 1)
    rs = RaySamples(
        origins=o, directions=d, pixel_area=jnp.full((R, 1), 1e-5),
        starts=jnp.tile(t[:-1], (R, 1)), ends=jnp.tile(t[1:], (R, 1)),
        camera_indices=jnp.zeros((R,), jnp.int32),
    )

    def loss(p):
        out = field.get_outputs(p, rs)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(
            (jnp.linalg.norm(out["gradient"], axis=-1) - 1) ** 2)

    g = jax.grad(loss)(params)
    return np.concatenate([np.ravel(le) for le in jax.tree_util.tree_leaves(g)])


@pytest.mark.parametrize("mode", ["nothing", "dots"])
def test_remat_policy_value_identical(monkeypatch, mode):
    base = _grad_with(monkeypatch, "save-hash")
    alt = _grad_with(monkeypatch, mode)
    np.testing.assert_allclose(base, alt, atol=1e-6)
