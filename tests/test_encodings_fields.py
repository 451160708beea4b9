"""Encoding + SDF field unit tests (modelled on reference
tests/field_components/test_encodings.py and field behavior specs)."""
import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.fields.sdf_field import SDFField, SDFFieldConfig
from sdfstudio_tpu.ops.encodings import (
    HashEncoding,
    NeRFEncoding,
    PeriodicVolumeEncoding,
    SHEncoding,
    TensorVMEncoding,
    nerf_encoding,
)
from sdfstudio_tpu.samplers.spaced import uniform_sampler


def test_nerf_encoding_values():
    # 1 frequency, min=max=0 -> sin(x), cos(x) per axis
    x = jnp.asarray([[0.0, 0.25, 1.0]])
    enc = nerf_encoding(x, num_frequencies=1, min_freq_exp=0.0, max_freq_exp=0.0)
    expected = np.concatenate([np.sin(x), np.sin(x + np.pi / 2)], axis=-1)
    np.testing.assert_allclose(np.asarray(enc), expected, atol=1e-6)


def test_nerf_encoding_shapes_and_ipe():
    m = NeRFEncoding(num_frequencies=4, max_freq_exp=3.0, include_input=True)
    x = jnp.zeros((5, 3))
    out = m(x)
    assert out.shape == (5, m.out_dim) == (5, 27)
    covs = jnp.eye(3)[None].repeat(5, axis=0) * 0.1
    out_ipe = m(x, covs=covs)
    assert out_ipe.shape == (5, 27)
    # IPE shrinks the encodings toward zero
    x2 = jnp.ones((5, 3)) * 0.3
    assert float(jnp.abs(m(x2, covs=covs * 10)[..., :24]).sum()) < float(
        jnp.abs(m(x2)[..., :24]).sum()
    )


def test_off_axis_dim():
    m = NeRFEncoding(num_frequencies=2, off_axis=True)
    assert m.out_dim == 21 * 2 * 2
    assert m(jnp.zeros((4, 3))).shape == (4, 84)


def test_sh_encoding():
    m = SHEncoding(levels=4)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    out = m(dirs)
    assert out.shape == (1, 16)
    np.testing.assert_allclose(float(out[0, 0]), 0.28209479, atol=1e-6)


def test_hash_encoding_interpolation_smoothness():
    m = HashEncoding(num_levels=4, min_res=4, max_res=32, log2_hashmap_size=10,
                     features_per_level=2, smoothstep=False)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    x0 = jnp.asarray([[0.37, 0.51, 0.42]])
    eps = 1e-4
    x1 = x0 + eps
    f0 = m.apply(params, x0)
    f1 = m.apply(params, x1)
    assert f0.shape == (1, 8)
    # continuous: small input change -> small output change
    assert float(jnp.abs(f1 - f0).max()) < 0.05
    # different regions give different features
    f2 = m.apply(params, jnp.asarray([[0.9, 0.1, 0.6]]))
    assert float(jnp.abs(f2 - f0).max()) > 0


def test_hash_encoding_dense_level_no_collision():
    # coarse level must be dense-indexed: distinct voxels -> distinct entries
    m = HashEncoding(num_levels=1, min_res=4, max_res=4, log2_hashmap_size=10)
    idx, _ = m.corner_indices(jnp.asarray([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]]))
    assert len(np.unique(np.asarray(idx))) == 16  # 8 distinct corners each


def test_hash_encoding_gradient_flows():
    m = HashEncoding(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=8)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))

    def loss(p, x):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params, jnp.asarray([[0.3, 0.4, 0.5]]))
    assert float(jnp.abs(g["params"]["hash_table"]).sum()) > 0


def test_periodic_volume_encoding_and_tv():
    m = PeriodicVolumeEncoding(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=9,
                               features_per_level=2)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    out = m.apply(params, jnp.asarray([[0.2, 0.5, 0.7]]))
    assert out.shape == (1, 4)
    tv = m.total_variation_loss(params["params"]["hash_table"])
    assert np.isfinite(float(tv)) and float(tv) > 0


def test_tensor_vm_encoding():
    m = TensorVMEncoding(resolution=16, num_components=4)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    out = m.apply(params, jnp.asarray([[0.2, 0.5, 0.7], [0.21, 0.5, 0.7]]))
    assert out.shape == (2, 12)
    assert float(jnp.abs(out[0] - out[1]).max()) < 0.5  # continuity


# ---------------------------------------------------------------------------
# SDF field
# ---------------------------------------------------------------------------


def small_field(**kw):
    cfg = SDFFieldConfig(
        num_layers=2,
        hidden_dim=32,
        geo_feat_dim=15,
        num_layers_color=2,
        hidden_dim_color=32,
        use_grid_feature=kw.pop("use_grid_feature", False),
        num_levels=4,
        max_res=64,
        base_res=16,
        log2_hashmap_size=10,
        inside_outside=kw.pop("inside_outside", False),
        **kw,
    )
    return SDFField(config=cfg, num_images=3)


def test_geometric_init_sphere():
    """With geometric init the raw field approximates sdf(x) = |x| - bias
    (reference sdf_field.py:292-310). The approximation tightens with
    width/depth, so use a realistically sized net."""
    cfg = SDFFieldConfig(
        num_layers=8, hidden_dim=256, geo_feat_dim=15, num_layers_color=2,
        hidden_dim_color=32, inside_outside=False,
    )
    field = SDFField(config=cfg, num_images=3)
    params = field.init(jax.random.PRNGKey(0))
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0], [0.0, 1.5, 0.0]])
    sdf = np.asarray(field.sdf_fn(params)(pts))
    # The init approximates a scaled sphere sdf (the torch reference init
    # itself yields ~0.64*|x| - 0.52 at these points): negative inside,
    # positive far outside, monotonically increasing with |x|.
    assert sdf[0] < -0.3
    assert sdf[2] > 0.2
    assert sdf[0] < sdf[1] < sdf[2]
    # sign flip with inside_outside
    field_io = SDFField(config=SDFFieldConfig(
        num_layers=8, hidden_dim=256, geo_feat_dim=15, num_layers_color=2,
        hidden_dim_color=32, inside_outside=True), num_images=3)
    params_io = field_io.init(jax.random.PRNGKey(0))
    sdf_io = field_io.sdf_fn(params_io)(pts)
    assert float(sdf_io[0]) > 0 > float(sdf_io[2])


def test_analytic_gradient_matches_fd():
    field = small_field()
    params = field.init(jax.random.PRNGKey(0))
    x = jnp.asarray([[0.3, -0.2, 0.5], [-0.6, 0.1, 0.2]])
    g = field.gradient(params, x)
    sdf_fn = field.sdf_fn(params)
    eps = 1e-3
    for axis in range(3):
        e = jnp.zeros((1, 3)).at[0, axis].set(eps)
        fd = (sdf_fn(x + e) - sdf_fn(x - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[:, axis]), np.asarray(fd), atol=1e-2)
    # eikonal property of geometric init: |grad| ~ 1 away from origin
    norms = np.linalg.norm(np.asarray(g), axis=-1)
    assert np.all(norms > 0.3) and np.all(norms < 2.0)


def test_numerical_gradient_mode():
    field = small_field(use_numerical_gradients=True)
    params = field.init(jax.random.PRNGKey(0))
    x = jnp.asarray([[0.3, -0.2, 0.5]])
    g, sampled = field.gradient(params, x, numerical_delta=1e-3, return_sampled_sdf=True)
    assert g.shape == (1, 3) and sampled.shape == (1, 6)
    g_analytic = jax.grad(lambda p: field.sdf_fn(params)(p).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_analytic), atol=1e-2)


def test_field_outputs_shapes():
    field = small_field(use_grid_feature=True)
    params = field.init(jax.random.PRNGKey(0))
    origins = jnp.zeros((4, 3)).at[:, 2].set(-2.0)
    rb = RayBundle(
        origins=origins,
        directions=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4, 1)),
        pixel_area=jnp.ones((4, 1)) * 1e-6,
        nears=jnp.ones((4, 1)),
        fars=jnp.ones((4, 1)) * 3.0,
        camera_indices=jnp.zeros((4,), jnp.int32),
    )
    rs = uniform_sampler(rb, 8, rng=None)
    out = field.get_outputs(params, rs, return_alphas=True, return_occupancy=True)
    assert out["rgb"].shape == (4, 8, 3)
    assert out["sdf"].shape == (4, 8)
    assert out["alpha"].shape == (4, 8)
    assert out["occupancy"].shape == (4, 8)
    assert out["normal"].shape == (4, 8, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["normal"]), axis=-1), 1.0, atol=1e-3
    )
    # rgb within padded range
    assert float(out["rgb"].min()) >= -0.0011 and float(out["rgb"].max()) <= 1.0011


def test_eikonal_double_backprop():
    """The eikonal loss (|grad|-1)^2 must be differentiable wrt params."""
    field = small_field()
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))

    def eikonal_loss(p):
        geonet = field.geonetwork_fn(p)
        grads = jax.grad(lambda q: jnp.sum(geonet(q)[..., 0]))(x)
        return jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)

    g = jax.grad(eikonal_loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_jvp_gradient_matches_reverse():
    """analytic_gradient_mode=jvp must equal reverse-mode exactly."""
    from sdfstudio_tpu.fields.sdf_field import analytic_sdf_gradient

    field = small_field(use_grid_feature=True)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (32, 3), minval=-1, maxval=1)
    sdf_fn = lambda p: field.geonetwork_fn(params)(p)[..., 0]
    g_rev = analytic_sdf_gradient(sdf_fn, x, mode="reverse")
    g_jvp = analytic_sdf_gradient(sdf_fn, x, mode="jvp")
    np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_jvp), rtol=1e-4, atol=1e-5)
