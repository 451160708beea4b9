"""Poisson surface reconstruction golden tests (utils/poisson.py — the
in-tree replacement for open3d's create_from_point_cloud_poisson used by
reference scripts/exporter.py:238)."""
import numpy as np
import pytest

from sdfstudio_tpu.utils.poisson import poisson_indicator, poisson_mesh


def _sphere_cloud(n=20000, r=0.6, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = v * r
    if noise:
        pts = pts + rng.normal(scale=noise, size=pts.shape)
    return pts, v  # outward normals


def test_poisson_sphere_radius_and_watertight():
    pts, nrm = _sphere_cloud()
    mesh = poisson_mesh(pts, nrm, resolution=96)
    assert len(mesh.vertices) > 500
    radii = np.linalg.norm(mesh.vertices, axis=-1)
    # reconstruction within ~1.5 cells of the true radius
    assert abs(np.median(radii) - 0.6) < 0.05, np.median(radii)
    assert radii.std() < 0.05
    # watertight: every edge shared by exactly two faces
    e = np.concatenate(
        [mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]], mesh.faces[:, [2, 0]]]
    )
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_poisson_indicator_sign_convention():
    pts, nrm = _sphere_cloud(n=8000)
    field, lo, cell = poisson_indicator(pts, nrm, resolution=64)
    n = field.shape[0]
    center = ((np.zeros(3) - lo) / cell).round().astype(int)
    assert field[tuple(center)] > 0  # positive inside
    assert field[2, 2, 2] <= 0  # outside corner


def test_poisson_robust_to_noise_and_flipped_bounds():
    pts, nrm = _sphere_cloud(n=30000, noise=0.01, seed=3)
    mesh = poisson_mesh(
        pts, nrm, resolution=80, bounds=(np.array([-1.0] * 3), np.array([1.0] * 3))
    )
    radii = np.linalg.norm(mesh.vertices, axis=-1)
    assert abs(np.median(radii) - 0.6) < 0.06


@pytest.mark.slow
def test_poisson_export_from_trained_model(tmp_path):
    """e2e: train briefly on the sphere fixture, backproject a point cloud,
    Poisson-reconstruct it (the sst-export poisson pipeline minus argparse)."""
    import jax

    from sdfstudio_tpu.data.synthetic import generate_sphere_dataset
    from sdfstudio_tpu.utils.exporter_utils import generate_point_cloud
    from tests.test_train_e2e import build_trainer

    data = tmp_path / "sphere"
    generate_sphere_dataset(data, num_images=8, width=48, height=48)
    trainer = build_trainer(data, tmp_path / "run", max_iters=80)
    trainer.setup()
    rng = jax.random.PRNGKey(0)
    for _ in range(80):
        rng, sub = jax.random.split(rng)
        trainer.state, _ = trainer._train_step(trainer.state, sub)
    cloud = generate_point_cloud(trainer, num_points=50000)
    assert cloud.normals is not None and len(cloud.vertices) > 1000
    mesh = poisson_mesh(cloud.vertices, cloud.normals, resolution=64)
    assert len(mesh.vertices) > 200
    radii = np.linalg.norm(mesh.vertices, axis=-1)
    # sphere fixture radius is 0.5; a briefly-trained field is loose
    assert abs(np.median(radii) - 0.5) < 0.15
