"""In-tree (screened) Poisson surface reconstruction on a uniform grid.

Functional spec: reference scripts/exporter.py:238-266 (ExportPoissonMesh)
delegates to open3d's `create_from_point_cloud_poisson`; this module removes
that dependency with the classic FFT formulation of Poisson reconstruction
[Kazhdan et al. 2006] on a dense grid, plus an optional screening pass
[Kazhdan & Hoppe 2013] that pulls the implicit function toward the input
samples:

1. splat oriented normals trilinearly into a vector field V on an N^3 grid
2. solve the Poisson equation lap(chi) = div(V) spectrally (periodic FFT —
   valid because the splat has compact support well inside the padded box)
3. iso level = mean of chi at the sample points
4. optional damped-Jacobi screening iterations of
   (lap - lam*W) chi = div(V) - lam*W*iso with W the splat density
5. marching tetrahedra on (chi - iso)

Everything is numpy: export is an offline path, and a 256^3 complex FFT is
~1 s on host.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _trilinear_splat(grid: np.ndarray, ijk: np.ndarray, frac: np.ndarray, values: np.ndarray):
    """Accumulate `values` [M, C] into `grid` [N,N,N,C] at fractional coords."""
    n = grid.shape[0]
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (frac[:, 0] if dx else 1.0 - frac[:, 0])
                    * (frac[:, 1] if dy else 1.0 - frac[:, 1])
                    * (frac[:, 2] if dz else 1.0 - frac[:, 2])
                )
                idx = np.minimum(ijk + np.array([dx, dy, dz]), n - 1)
                np.add.at(
                    grid,
                    (idx[:, 0], idx[:, 1], idx[:, 2]),
                    values * w[:, None],
                )


def _trilinear_sample(grid: np.ndarray, ijk: np.ndarray, frac: np.ndarray) -> np.ndarray:
    n = grid.shape[0]
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (frac[:, 0] if dx else 1.0 - frac[:, 0])
                    * (frac[:, 1] if dy else 1.0 - frac[:, 1])
                    * (frac[:, 2] if dz else 1.0 - frac[:, 2])
                )
                idx = np.minimum(ijk + np.array([dx, dy, dz]), n - 1)
                out = out + grid[idx[:, 0], idx[:, 1], idx[:, 2]] * w
    return out


def poisson_indicator(
    points: np.ndarray,
    normals: np.ndarray,
    resolution: int = 192,
    bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    margin: float = 0.15,
    screen_weight: float = 4.0,
    screen_iters: int = 20,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Solve for the indicator-like field chi on a `resolution`^3 grid.

    Returns (chi_minus_iso, grid_min, cell_size): positive inside the
    surface, zero level at the reconstruction.
    """
    points = np.asarray(points, np.float64)
    normals = np.asarray(normals, np.float64)
    nrm = np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / np.maximum(nrm, 1e-12)
    if bounds is None:
        lo, hi = points.min(0), points.max(0)
    else:
        lo, hi = np.asarray(bounds[0], np.float64), np.asarray(bounds[1], np.float64)
    extent = float((hi - lo).max())
    pad = extent * margin
    lo = lo - pad
    cell = (extent + 2 * pad) / (resolution - 1)

    g = (points - lo) / cell
    ijk = np.clip(np.floor(g).astype(np.int64), 0, resolution - 1)
    frac = np.clip(g - ijk, 0.0, 1.0)

    # oriented-normal splat (the smoothed gradient field of the indicator)
    V = np.zeros((resolution,) * 3 + (3,), np.float64)
    _trilinear_splat(V, ijk, frac, normals)

    # divergence via central differences, in grid units
    div = np.zeros((resolution,) * 3, np.float64)
    for a in range(3):
        div += 0.5 * (np.roll(V[..., a], -1, axis=a) - np.roll(V[..., a], 1, axis=a))

    # spectral Poisson solve: lap chi = div  (periodic; the padding margin
    # keeps wrap-around influence negligible)
    k = np.fft.fftfreq(resolution) * 2.0 * np.pi
    kx, ky, kz = np.meshgrid(k, k, k, indexing="ij")
    # eigenvalues of the 3-point Laplacian stencil: 2 cos(k) - 2 per axis
    denom = (2 * np.cos(kx) - 2) + (2 * np.cos(ky) - 2) + (2 * np.cos(kz) - 2)
    denom[0, 0, 0] = 1.0  # zero-mean gauge
    chi_hat = np.fft.fftn(div) / denom
    chi_hat[0, 0, 0] = 0.0
    chi = np.real(np.fft.ifftn(chi_hat))

    iso = float(np.mean(_trilinear_sample(chi, ijk, frac)))

    if screen_weight > 0.0 and screen_iters > 0:
        # screening: pull chi toward `iso` where samples live
        # (lap - lam W) chi = div - lam W iso, damped Jacobi with the FFT
        # solution as initializer; W = splat density, normalized
        W = np.zeros((resolution,) * 3 + (1,), np.float64)
        _trilinear_splat(W, ijk, frac, np.ones((len(points), 1)))
        W = W[..., 0]
        W *= screen_weight / max(W.mean(), 1e-12)
        rhs = div - W * iso
        diag = -6.0 - W  # Jacobi diagonal of (lap - W)
        for _ in range(screen_iters):
            neigh = (
                np.roll(chi, 1, 0) + np.roll(chi, -1, 0)
                + np.roll(chi, 1, 1) + np.roll(chi, -1, 1)
                + np.roll(chi, 1, 2) + np.roll(chi, -1, 2)
            )
            chi_new = (rhs - neigh) / diag
            chi = 0.7 * chi_new + 0.3 * chi
        iso = float(np.mean(_trilinear_sample(chi, ijk, frac)))

    field = chi - iso
    # orient: the indicator gradient at samples must align with the OUTWARD
    # normals' negative (chi higher inside); flip if it doesn't
    gx = np.stack(
        [0.5 * (np.roll(field, -1, a) - np.roll(field, 1, a)) for a in range(3)], -1
    )
    dots = 0.0
    for a in range(3):
        dots += np.sum(_trilinear_sample(gx[..., a], ijk, frac) * normals[:, a])
    if dots > 0:  # gradient points along outward normal -> chi larger outside
        field = -field
    return field.astype(np.float32), lo.astype(np.float32), np.float32(cell)


def poisson_mesh(
    points: np.ndarray,
    normals: np.ndarray,
    resolution: int = 192,
    bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    **kw,
):
    """Full reconstruction: oriented point cloud -> TriMesh (marching tets
    on the Poisson indicator). The in-tree replacement for
    open3d.create_from_point_cloud_poisson (reference exporter.py:238)."""
    from sdfstudio_tpu.utils.marching_cubes import marching_tetrahedra

    field, lo, cell = poisson_indicator(points, normals, resolution, bounds, **kw)
    # marching_tetrahedra meshes the NEGATIVE-inside convention (SDF);
    # poisson_indicator returns positive-inside, so negate
    return marching_tetrahedra(
        -field, level=0.0, origin=tuple(lo), spacing=(float(cell),) * 3
    )
