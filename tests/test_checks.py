"""Trace-time shape validation (utils/checks.py) fires on malformed ray
structures and stays silent on valid ones — including under jit."""
import jax
import jax.numpy as jnp
import pytest

from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.utils import checks


def _bundle(r=4, bad_pixel_area=False):
    return RayBundle(
        origins=jnp.zeros((r, 3)),
        directions=jnp.ones((r, 3)),
        pixel_area=jnp.ones((r,) if bad_pixel_area else (r, 1)),
        nears=jnp.zeros((r, 1)),
        fars=jnp.ones((r, 1)),
    )


def test_valid_bundle_passes():
    rb = _bundle()
    bins = jnp.linspace(0, 1, 9)[None, :].repeat(4, axis=0)
    rs = rb.get_ray_samples(bins)
    assert rs.num_samples == 8


def test_bad_pixel_area_raises_at_trace_time():
    rb = _bundle(bad_pixel_area=True)
    bins = jnp.linspace(0, 1, 9)[None, :].repeat(4, axis=0)

    @jax.jit
    def go(rb):
        return rb.get_ray_samples(bins).starts

    with pytest.raises(ValueError, match="pixel_area"):
        go(rb)


def test_mismatched_bins_raise():
    rb = _bundle(r=4)
    bins = jnp.linspace(0, 1, 9)[None, :].repeat(3, axis=0)  # 3 rays != 4
    with pytest.raises(ValueError):
        rb.get_ray_samples(bins)


def test_disable_flag():
    checks.ENABLED = False
    try:
        rb = _bundle(bad_pixel_area=True)
        bins = jnp.linspace(0, 1, 9)[None, :].repeat(4, axis=0)
        rb.get_ray_samples(bins)  # no raise
    finally:
        checks.ENABLED = True


def test_field_positions_checked():
    """Fields-layer boundary: wrong trailing dim fails at TRACE time
    (SURVEY §4 runtime-checking discipline)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from sdfstudio_tpu.ops.encodings import HashEncoding

    enc = HashEncoding(num_levels=2, max_res=32, log2_hashmap_size=8)
    bad = jnp.zeros((16, 2))  # trailing dim 2, not 3
    with pytest.raises(ValueError, match="trailing dim 3"):
        enc.init(jax.random.PRNGKey(0), bad)
    badint = jnp.zeros((16, 3), jnp.int32)
    with pytest.raises(ValueError, match="float dtype"):
        enc.init(jax.random.PRNGKey(0), badint)


def test_pdf_bins_weights_contract():
    import jax.numpy as jnp
    import pytest

    from sdfstudio_tpu.samplers.pdf import sample_pdf_bins

    bins = jnp.linspace(0, 1, 9)[None].repeat(4, 0)  # [4, 9]
    weights = jnp.ones((4, 8))
    out = sample_pdf_bins(bins, weights, num_samples=4)
    assert out.shape == (4, 5)

    with pytest.raises(ValueError, match="bins"):
        sample_pdf_bins(bins, jnp.ones((4, 9)), num_samples=4)  # N+1 weights
    with pytest.raises(ValueError, match="bins"):
        sample_pdf_bins(bins[:2], weights, num_samples=4)  # ray-count mismatch


def test_renderer_weights_values_contract():
    """Renderers-layer boundary: sample-axis disagreement fails at trace
    time instead of silently broadcasting (SURVEY §4)."""
    from sdfstudio_tpu.ops import render

    weights = jnp.ones((4, 8))
    rgb = jnp.ones((4, 8, 3))
    assert render.render_rgb(rgb, weights).shape == (4, 3)

    with pytest.raises(ValueError, match="render_rgb"):
        render.render_rgb(jnp.ones((4, 1, 3)), weights)  # sample axis 1 != 8
    with pytest.raises(ValueError, match="render_normals"):
        render.render_normals(jnp.ones((4, 9, 3)), weights)
    with pytest.raises(ValueError, match="render_depth_expected"):
        render.render_depth_expected(weights, jnp.ones((4, 9)), jnp.ones((4, 8)))
    with pytest.raises(ValueError, match="render_uncertainty"):
        render.render_uncertainty(jnp.ones((4, 9)), weights)


def test_sampler_entries_check_bundles():
    """Samplers-layer boundary: every sampler entry validates its
    RayBundle, so direct (non-generate_rays) callers are covered too."""
    from sdfstudio_tpu.samplers.spaced import uniform_sampler

    rb = _bundle(bad_pixel_area=True)
    with pytest.raises(ValueError, match="pixel_area"):
        uniform_sampler(rb, num_samples=8)
