"""Camera / ray-generation tests (modelled on reference tests/cameras/)."""
import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.cameras.camera_optimizers import CameraOptimizer, CameraOptimizerConfig
from sdfstudio_tpu.cameras.camera_utils import (
    auto_orient_and_center_poses,
    get_interpolated_poses,
    radial_and_tangential_undistort,
)
from sdfstudio_tpu.cameras.cameras import Cameras, CameraType
from sdfstudio_tpu.cameras.lie_groups import exp_map_SE3, exp_map_SO3xR3


def make_cameras(n=2, h=10, w=12):
    c2w = np.tile(np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1), (n, 1, 1))
    return Cameras.create(
        camera_to_worlds=c2w, fx=10.0, fy=10.0, cx=w / 2, cy=h / 2, width=w, height=h
    )


def test_center_pixel_ray_points_forward():
    cams = make_cameras()
    # principal point -> optical axis (-z in camera frame = world -z here)
    coords = jnp.asarray([[5.0, 6.0]])
    rb = cams.generate_rays(jnp.asarray([0], jnp.int32), coords)
    np.testing.assert_allclose(np.asarray(rb.directions[0]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.origins[0]), 0.0, atol=1e-6)
    assert float(rb.pixel_area[0, 0]) > 0
    np.testing.assert_allclose(float(rb.directions_norm[0, 0]), 1.0, atol=1e-6)


def test_offaxis_ray_direction():
    cams = make_cameras()
    rb = cams.generate_rays(jnp.asarray([0], jnp.int32), jnp.asarray([[5.0, 16.0]]))
    # x offset of 10 px at fx=10 -> 45 degrees
    d = np.asarray(rb.directions[0])
    np.testing.assert_allclose(d[0] / -d[2], 1.0, atol=1e-5)
    # directions_norm reflects pre-normalization length sqrt(2)
    np.testing.assert_allclose(float(rb.directions_norm[0, 0]), np.sqrt(2), atol=1e-5)


def test_full_image_rays_shape():
    cams = make_cameras(h=4, w=6)
    rb = cams.generate_image_rays(0)
    assert rb.origins.shape == (24, 3)
    assert rb.directions.shape == (24, 3)


def test_undistort_roundtrip():
    # distort analytically, then undo
    params = jnp.asarray([0.1, 0.01, 0.0, 0.0, 0.001, 0.001])
    xy = jnp.asarray([[0.1, -0.2], [0.3, 0.25]])
    x, y = xy[:, 0], xy[:, 1]
    r = x * x + y * y
    d = 1 + params[0] * r + params[1] * r**2
    xd = x * d + 2 * params[4] * x * y + params[5] * (r + 2 * x * x)
    yd = y * d + 2 * params[5] * x * y + params[4] * (r + 2 * y * y)
    distorted = jnp.stack([xd, yd], -1)
    out = radial_and_tangential_undistort(distorted, params[None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(xy), atol=1e-5)


def test_exp_maps_identity_and_rotation():
    np.testing.assert_allclose(
        np.asarray(exp_map_SO3xR3(jnp.zeros((1, 6)))[0, :, :3]), np.eye(3), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(exp_map_SE3(jnp.zeros((1, 6)))[0, :, :3]), np.eye(3), atol=1e-6
    )
    # 90-degree z rotation
    t = jnp.asarray([[0, 0, 0, 0, 0, np.pi / 2]])
    R = np.asarray(exp_map_SO3xR3(t)[0, :, :3])
    np.testing.assert_allclose(R @ np.asarray([1, 0, 0.0]), [0, 1, 0], atol=1e-6)
    # SE3 translation passes through V matrix
    t2 = jnp.asarray([[1.0, 0, 0, 0, 0, 0]])
    np.testing.assert_allclose(np.asarray(exp_map_SE3(t2)[0, :, 3]), [1, 0, 0], atol=1e-6)


def test_camera_optimizer_modes():
    for mode in ["off", "SO3xR3", "SE3"]:
        opt = CameraOptimizer(num_cameras=3, config=CameraOptimizerConfig(mode=mode))
        params = opt.init(jax.random.PRNGKey(0), jnp.zeros((5,), jnp.int32))
        out = opt.apply(params, jnp.zeros((5,), jnp.int32))
        assert out.shape == (5, 3, 4)
        np.testing.assert_allclose(np.asarray(out[0, :, :3]), np.eye(3), atol=1e-6)


def test_auto_orient_up():
    # cameras with up vector tilted: orientation should align mean up to +z
    n = 4
    poses = np.tile(np.eye(4), (n, 1, 1))
    tilt = np.array(
        [[1, 0, 0], [0, np.cos(0.4), -np.sin(0.4)], [0, np.sin(0.4), np.cos(0.4)]]
    )
    poses[:, :3, :3] = tilt
    poses[:, :3, 3] = np.random.RandomState(0).randn(n, 3)
    oriented, transform = auto_orient_and_center_poses(poses, method="up")
    up = oriented[:, :3, 1].mean(axis=0)
    up = up / np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-5)
    # centered
    np.testing.assert_allclose(oriented[:, :3, 3].mean(axis=0), 0.0, atol=1e-5)


def test_interpolated_poses():
    a = np.eye(4)
    b = np.eye(4)
    b[:3, 3] = [2, 0, 0]
    poses = get_interpolated_poses(a, b, steps=5)
    assert poses.shape == (5, 3, 4)
    np.testing.assert_allclose(poses[2][:3, 3], [1, 0, 0], atol=1e-6)
