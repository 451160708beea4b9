"""Mesh extraction tests: analytic-sdf golden checks."""
import numpy as np
import jax.numpy as jnp

from sdfstudio_tpu.utils.marching_cubes import (
    evaluate_sdf_grid,
    get_surface_sliding,
    get_surface_sliding_with_contraction,
    marching_tetrahedra,
)
from sdfstudio_tpu.utils.mesh_io import TriMesh, read_ply


def sphere_sdf_np(res=33, r=0.6):
    xs = np.linspace(-1, 1, res)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    return np.linalg.norm(g, axis=-1) - r


def test_marching_tetrahedra_sphere():
    res = 33
    grid = sphere_sdf_np(res)
    spacing = 2.0 / (res - 1)
    mesh = marching_tetrahedra(grid, 0.0, origin=(-1, -1, -1), spacing=(spacing,) * 3)
    assert len(mesh.vertices) > 100
    radii = np.linalg.norm(mesh.vertices, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)
    assert radii.std() < 0.02
    # watertight-ish: every edge appears exactly twice
    edges = np.concatenate(
        [mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]], mesh.faces[:, [2, 0]]]
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_empty_grid():
    grid = np.ones((9, 9, 9), np.float32)
    mesh = marching_tetrahedra(grid)
    assert len(mesh.vertices) == 0


def test_get_surface_sliding_blocks_seamless():
    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.55

    mesh = get_surface_sliding(
        sdf_fn, resolution=64, block_res=32, chunk=8192
    )
    radii = np.linalg.norm(mesh.vertices, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.55, atol=0.02)


def test_contraction_extraction_inverts_vertices():
    # sdf defined in contracted space: sphere of contracted-radius 1.5
    def sdf_contracted(pts):
        return jnp.linalg.norm(pts, axis=-1) - 1.5

    mesh = get_surface_sliding_with_contraction(
        sdf_contracted, resolution=48, block_res=48, order=None, chunk=8192
    )
    # contracted radius 1.5 -> world radius 1/(2-1.5) = 2
    radii = np.linalg.norm(mesh.vertices, axis=-1)
    np.testing.assert_allclose(np.median(radii), 2.0, atol=0.1)


def test_ply_roundtrip(tmp_path):
    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    mesh = get_surface_sliding(sdf_fn, resolution=32, block_res=32, chunk=8192)
    path = tmp_path / "m.ply"
    mesh.export(path)
    back = read_ply(path)
    assert len(back.vertices) == len(mesh.vertices)
    assert len(back.faces) == len(mesh.faces)
    np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-6)
    obj = tmp_path / "m.obj"
    mesh.export(obj)
    assert obj.read_text().startswith("v ")
