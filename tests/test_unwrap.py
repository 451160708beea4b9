"""Chart UV unwrap tests (in-tree xatlas replacement, utils/unwrap.py).

Reference behavior: nerfstudio/exporter/texture_utils.py:210-326 — charts
with bounded distortion packed into one atlas without cross-chart overlap.
"""
import numpy as np
import pytest

from sdfstudio_tpu.utils.marching_cubes import marching_tetrahedra
from sdfstudio_tpu.utils.unwrap import (
    dilate_texture,
    grow_charts,
    rasterize_atlas,
    unwrap_charts,
)


@pytest.fixture(scope="module")
def sphere_mesh():
    res = 25
    xs = np.linspace(-1, 1, res)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    grid = np.linalg.norm(g, axis=-1) - 0.6
    spacing = 2.0 / (res - 1)
    return marching_tetrahedra(grid, 0.0, origin=(-1, -1, -1), spacing=(spacing,) * 3)


def test_charts_cover_all_faces(sphere_mesh):
    chart = grow_charts(np.asarray(sphere_mesh.vertices), np.asarray(sphere_mesh.faces))
    assert (chart >= 0).all()
    # a sphere at 60 deg threshold needs more than one chart but far fewer
    # than one per face
    n_charts = chart.max() + 1
    assert 1 < n_charts < len(sphere_mesh.faces) / 4


def test_unwrap_uvs_valid_and_charts_disjoint(sphere_mesh):
    verts = np.asarray(sphere_mesh.vertices)
    faces = np.asarray(sphere_mesh.faces)
    T = 256
    uvs, chart = unwrap_charts(verts, faces, texture_size=T)
    assert uvs.shape == (len(faces), 3, 2)
    assert (uvs >= 0).all() and (uvs <= 1).all()

    # per-chart bounding boxes must be pairwise disjoint (seam-sane packing)
    n_charts = chart.max() + 1
    boxes = []
    for cid in range(n_charts):
        cuv = uvs[chart == cid].reshape(-1, 2)
        boxes.append((cuv[:, 0].min(), cuv[:, 0].max(), cuv[:, 1].min(), cuv[:, 1].max()))
    eps = 0.25 / T  # quarter-texel tolerance
    for i in range(n_charts):
        for j in range(i + 1, n_charts):
            x0, x1, y0, y1 = boxes[i]
            a0, a1, b0, b1 = boxes[j]
            overlap = max(0, min(x1, a1) - max(x0, a0) + eps) * max(
                0, min(y1, b1) - max(y0, b0) + eps
            )
            assert overlap <= eps * 2, f"charts {i},{j} overlap"


def test_unwrap_bounded_area_distortion(sphere_mesh):
    verts = np.asarray(sphere_mesh.vertices, np.float64)
    faces = np.asarray(sphere_mesh.faces)
    uvs, _ = unwrap_charts(verts, faces, texture_size=512)
    tri = verts[faces]
    a3d = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    )
    e1 = uvs[:, 1] - uvs[:, 0]
    e2 = uvs[:, 2] - uvs[:, 0]
    a2d = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    keep = a3d > np.percentile(a3d, 20)  # ignore marching-tet slivers
    ratio = a2d[keep] / a3d[keep]
    # planar projection of <=60-degree charts: area scale within cos(60)=0.5x
    # of the median (uniform global scale cancels in the ratio)
    med = np.median(ratio)
    assert (ratio > 0.3 * med).all() and (ratio < 3.0 * med).all()


def test_rasterize_covers_most_chart_area(sphere_mesh):
    verts = np.asarray(sphere_mesh.vertices)
    faces = np.asarray(sphere_mesh.faces)
    T = 256
    uvs, _ = unwrap_charts(verts, faces, texture_size=T)
    face_id, bary, covered = rasterize_atlas(uvs, T)
    # covered texel fraction should approximate the summed UV area
    e1 = uvs[:, 1] - uvs[:, 0]
    e2 = uvs[:, 2] - uvs[:, 0]
    a2d = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]).sum()
    frac = covered.mean()
    assert abs(frac - a2d) < 0.15 * max(a2d, 0.01)
    # barycentrics of covered texels are valid
    ys, xs = np.nonzero(covered)
    w = bary[ys, xs]
    assert np.allclose(w.sum(-1), 1.0, atol=1e-4)
    assert (w > -1e-4).all()


def test_dilate_texture_fills_gutter():
    tex = np.zeros((8, 8, 3), np.float32)
    cov = np.zeros((8, 8), bool)
    tex[3:5, 3:5] = 1.0
    cov[3:5, 3:5] = True
    out = dilate_texture(tex, cov, iterations=2)
    assert out[2, 3].sum() > 0 and out[5, 4].sum() > 0  # bled outward
    assert (out[3:5, 3:5] == 1.0).all()  # covered untouched
