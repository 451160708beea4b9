"""Loss zoo golden/property tests (specs: reference losses.py formulas)."""
import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.components import losses as L
from sdfstudio_tpu.core.rays import RayBundle
from sdfstudio_tpu.samplers.spaced import uniform_sampler


def make_samples(R=4, S=16, near=1.0, far=2.0):
    rb = RayBundle(
        origins=jnp.zeros((R, 3)),
        directions=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (R, 1)),
        pixel_area=jnp.ones((R, 1)) * 1e-6,
        nears=jnp.full((R, 1), near),
        fars=jnp.full((R, 1), far),
    )
    return uniform_sampler(rb, S, rng=None)


def test_interlevel_loss_zero_when_consistent():
    """When the proposal histogram upper-bounds the fine one, loss = 0."""
    fine = make_samples(S=8)
    prop = make_samples(S=8)
    w_fine = jnp.ones((4, 8)) / 8
    w_prop = jnp.ones((4, 8)) / 8  # identical bins: bound satisfied
    loss = L.interlevel_loss([w_prop, w_fine], [prop, fine])
    assert float(loss) < 1e-6


def test_interlevel_loss_positive_when_violated():
    fine = make_samples(S=8)
    prop = make_samples(S=8)
    w_fine = jnp.zeros((4, 8)).at[:, 3].set(1.0)
    w_prop = jnp.zeros((4, 8)).at[:, 6].set(1.0)  # proposal mass elsewhere
    loss = L.interlevel_loss([w_prop, w_fine], [prop, fine])
    assert float(loss) > 0.1


def test_interlevel_zip_runs_and_nonnegative():
    fine = make_samples(S=8)
    p1, p2 = make_samples(S=12), make_samples(S=10)
    wl = [jnp.ones((4, 12)) / 12, jnp.ones((4, 10)) / 10, jnp.ones((4, 8)) / 8]
    loss = L.interlevel_loss_zip(wl, [p1, p2, fine])
    assert float(loss) >= 0 and np.isfinite(float(loss))


def test_distortion_loss_prefers_compact_weights():
    s = make_samples(S=32)
    w_spread = jnp.ones((4, 32)) / 32
    w_compact = jnp.zeros((4, 32)).at[:, 16].set(1.0)
    l_spread = L.distortion_loss([w_spread], [s])
    l_compact = L.distortion_loss([w_compact], [s])
    assert float(l_compact) < float(l_spread)


def test_monosdf_normal_loss_zero_for_identical():
    n = jax.random.normal(jax.random.PRNGKey(0), (16, 3))
    assert float(L.monosdf_normal_loss(n, n)) < 1e-5
    assert float(L.monosdf_normal_loss(n, -n)) > 1.0


def test_scale_shift_invariance():
    """Loss must be invariant to affine transforms of the prediction."""
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.uniform(1, 3, (1, 8, 8)).astype(np.float32))
    mask = jnp.ones_like(target)
    pred = target * 3.7 + 1.2  # affine-transformed: should align perfectly
    loss = L.scale_and_shift_invariant_loss(pred, target, mask, scales=1)
    assert float(loss) < 1e-4
    noisy = pred + jnp.asarray(rng.normal(0, 0.5, (1, 8, 8)).astype(np.float32))
    assert float(L.scale_and_shift_invariant_loss(noisy, target, mask, scales=1)) > 1e-3


def test_compute_scale_and_shift_closed_form():
    pred = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32).reshape(1, 8, 8))
    target = pred * 2.0 + 0.25
    scale, shift = L.compute_scale_and_shift(pred, target, jnp.ones_like(pred))
    np.testing.assert_allclose(float(scale[0]), 2.0, atol=1e-4)
    np.testing.assert_allclose(float(shift[0]), 0.25, atol=1e-4)


def test_ncc_identical_patches_zero():
    p = jax.random.uniform(jax.random.PRNGKey(0), (5, 7, 7, 3))
    score = L.ncc_score(p, p)
    np.testing.assert_allclose(np.asarray(score), 0.0, atol=1e-3)
    # inverted patches -> max score ~2
    score_inv = L.ncc_score(p, 1.0 - p)
    assert np.all(np.asarray(score_inv) > 1.5)


def test_multi_view_loss_masks_invalid():
    P = 5
    patches = jax.random.uniform(jax.random.PRNGKey(0), (4, 6, P * P, 3))
    valid = jnp.ones((4, 6, P * P, 1), bool)
    loss = L.multi_view_loss(patches, valid, patch_size=P, topk=2)
    assert np.isfinite(float(loss))
    # all-invalid -> zero loss
    loss0 = L.multi_view_loss(patches, jnp.zeros_like(valid), patch_size=P, topk=2)
    assert float(loss0) == 0.0


def test_sensor_depth_loss_components():
    R, S = 4, 16
    s = make_samples(R, S, near=0.5, far=2.5)
    depth_gt = jnp.full((R, 1), 1.5)
    depth_pred = jnp.full((R, 1), 1.4)
    # sdf consistent with depth 1.5 along the ray
    z = s.starts
    sdf = 1.5 - z
    l1, fs, sl = L.sensor_depth_loss(
        depth_pred, depth_gt, s.starts, sdf, jnp.ones((R, 1)), truncation=0.1
    )
    np.testing.assert_allclose(float(l1), 0.1, atol=1e-5)
    assert float(fs) < 1e-6  # free space satisfied
    assert float(sl) < 1e-6  # sdf consistent


def test_s3im_zero_for_identical():
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (256, 3))
    loss = L.s3im_loss(x, x, jax.random.PRNGKey(1), patch_height=16)
    assert float(loss) < 1e-4
    y = jax.random.uniform(jax.random.PRNGKey(2), (256, 3))
    assert float(L.s3im_loss(x, y, jax.random.PRNGKey(1), patch_height=16)) > 0.1


def test_curvature_loss_flat_surface_zero():
    # planar sdf: taps (+d,-d) sum to 2*center along each axis -> zero
    sdf = jnp.asarray([0.3, -0.2])
    d = 0.01
    taps = jnp.stack([
        sdf + d, sdf - d, sdf, sdf, sdf, sdf,
    ], axis=-1)  # x-axis linear, y/z constant-with-center... adjust
    taps = jnp.stack([sdf + d, sdf - d, sdf + 0, sdf - 0, sdf, sdf], axis=-1)
    loss = L.curvature_loss(taps, sdf, jnp.asarray(d))
    assert float(loss) < 1e-3


def test_orientation_and_pred_normal_losses():
    w = jnp.ones((2, 4)) * 0.25
    normals = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (2, 4, 1))
    viewdirs = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (2, 1))
    # normals facing the camera: n.v = -1 < 0 -> fmin(0, -1)^2 = 1 weighted
    lo = L.orientation_loss(w, normals, viewdirs)
    np.testing.assert_allclose(np.asarray(lo), 1.0, atol=1e-6)
    # away-facing
    lo2 = L.orientation_loss(w, normals, -viewdirs)
    np.testing.assert_allclose(np.asarray(lo2), 0.0, atol=1e-6)
    pn = L.pred_normal_loss(w, normals, normals)
    np.testing.assert_allclose(np.asarray(pn), 0.0, atol=1e-6)
