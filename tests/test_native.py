"""Tests for the in-tree C++ native components (native/sst_native.cc) and
their parity with the pure-numpy fallback paths."""
import numpy as np
import pytest

from sdfstudio_tpu import native
from sdfstudio_tpu.utils.marching_cubes import marching_tetrahedra, simplify_mesh
from sdfstudio_tpu.utils.mesh_io import TriMesh


def _sphere_grid(n=48, r=0.6):
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - r


needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="no native toolchain"
)


@needs_native
def test_native_marching_tets_sphere():
    n = 48
    grid = _sphere_grid(n)
    spacing = (2.0 / (n - 1),) * 3
    verts, faces = native.marching_tets(grid, 0.0, origin=(-1, -1, -1), spacing=spacing)
    assert len(verts) > 1000 and len(faces) > 2000
    r = np.linalg.norm(verts, axis=1)
    assert np.abs(r - 0.6).max() < 0.01
    # watertight: every undirected edge appears exactly twice
    edges = {}
    for f in faces:
        for i in range(3):
            a, b = int(f[i]), int(f[(i + 1) % 3])
            k = (min(a, b), max(a, b))
            edges[k] = edges.get(k, 0) + 1
    assert all(c == 2 for c in edges.values())


@needs_native
def test_native_matches_numpy_fallback():
    """Same decomposition → same surface (vertex sets coincide)."""
    import os

    n = 24
    grid = _sphere_grid(n, r=0.55)
    spacing = (2.0 / (n - 1),) * 3
    nat = native.marching_tets(grid, 0.0, origin=(-1, -1, -1), spacing=spacing)
    assert nat is not None
    vn = np.asarray(sorted(map(tuple, np.round(nat[0], 5).tolist())))
    # numpy fallback path (bypass native by calling internals)
    os.environ["SST_DISABLE_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        mesh = marching_tetrahedra(grid, 0.0, origin=(-1, -1, -1), spacing=spacing)
    finally:
        del os.environ["SST_DISABLE_NATIVE"]
        native._tried = False
        native._lib = None
    vp = np.asarray(sorted(map(tuple, np.round(mesh.vertices, 5).tolist())))
    assert vn.shape == vp.shape
    assert np.allclose(vn, vp, atol=1e-4)


@needs_native
def test_native_simplify_quadric():
    n = 48
    grid = _sphere_grid(n)
    spacing = (2.0 / (n - 1),) * 3
    verts, faces = native.marching_tets(grid, 0.0, origin=(-1, -1, -1), spacing=spacing)
    mesh = simplify_mesh(TriMesh(verts, faces), 500)
    assert len(mesh.faces) <= 520
    r = np.linalg.norm(mesh.vertices, axis=1)
    # decimated sphere stays a sphere
    assert np.abs(r - 0.6).mean() < 0.02


@needs_native
def test_native_tsdf_integrate():
    """Fuse a synthetic frontal depth map of a plane at z=+0.5 (camera at
    origin looking down +z with identity rotation in OpenCV convention)."""
    n = 32
    tsdf = np.ones((n, n, n), np.float32)
    weights = np.zeros((n, n, n), np.float32)
    origin = np.array([-1, -1, 0.01], np.float32)
    voxel = 2.0 / (n - 1)
    K = np.array([[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)  # camera at world origin, +z forward
    depth = np.full((64, 64), 0.5, np.float32)
    ok = native.tsdf_integrate(tsdf, weights, origin, voxel, K, w2c, depth, trunc=0.2)
    assert ok
    touched = weights > 0
    assert touched.any()
    # voxels just in front of the plane (z < 0.5) → positive tsdf;
    # just behind (within truncation) → negative
    zs = origin[2] + np.arange(n) * voxel
    front = touched & (zs[None, None, :] < 0.45)
    behind = touched & (zs[None, None, :] > 0.55) & (zs[None, None, :] < 0.65)
    assert tsdf[front].mean() > 0.2
    assert tsdf[behind].mean() < 0.0
