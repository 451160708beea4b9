"""Mesh extraction from the SDF: sliding-window grid evaluation on TPU +
vectorized host-side marching tetrahedra.

Functional spec: reference nerfstudio/utils/marching_cubes.py:14-341
(get_surface_sliding with 512^3 blocks + coarse-to-fine masking via
skimage.measure.marching_cubes; contraction variant with visibility mask and
inverse-contracted vertices). skimage is unavailable here, so the topology
stage is a fully vectorized numpy marching-TETRAHEDRA (6 tets/cube — no
lookup tables, watertight output); the hot part (SDF evaluation over the
grid) runs as one jitted chunked query on TPU either way.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdfstudio_tpu.ops.contraction import contract_inv
from sdfstudio_tpu.utils.mesh_io import TriMesh, concatenate

# 6-tetrahedra decomposition of the unit cube around the 0-7 main diagonal
# (one tet per edge-path 0 -> a -> b -> 7). Cube corner order: bit0=x,
# bit1=y, bit2=z (corner c at (c&1, (c>>1)&1, (c>>2)&1)). This decomposition
# places matching face diagonals on opposite cube faces, so neighboring
# cubes tile seamlessly (no cracks between marching blocks).
TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 1, 5, 7],
        [0, 2, 3, 7],
        [0, 2, 6, 7],
        [0, 4, 5, 7],
        [0, 4, 6, 7],
    ],
    np.int32,
)
# cube corner offsets (x, y, z)
CORNERS = np.array(
    [[c & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], np.int32
)
# tet edges as pairs of tet-local vertices
TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)
# case -> up to 2 triangles of edge ids (-1 padded); "inside" bit i = v_i < level
TET_TRIS = -np.ones((16, 2, 3), np.int32)
TET_TRIS[1, 0] = (0, 1, 2)
TET_TRIS[14, 0] = (0, 2, 1)
TET_TRIS[2, 0] = (0, 4, 3)
TET_TRIS[13, 0] = (0, 3, 4)
TET_TRIS[4, 0] = (1, 3, 5)
TET_TRIS[11, 0] = (1, 5, 3)
TET_TRIS[8, 0] = (2, 5, 4)
TET_TRIS[7, 0] = (2, 4, 5)
TET_TRIS[3] = [(1, 4, 3), (1, 2, 4)]
TET_TRIS[12] = [(1, 3, 4), (1, 4, 2)]
TET_TRIS[5] = [(0, 3, 5), (0, 5, 2)]
TET_TRIS[10] = [(0, 5, 3), (0, 2, 5)]
TET_TRIS[9, 0] = (0, 1, 5)
TET_TRIS[9, 1] = (0, 5, 4)
TET_TRIS[6, 0] = (0, 4, 5)
TET_TRIS[6, 1] = (0, 5, 1)


def marching_tetrahedra(
    grid: np.ndarray,  # [Nx, Ny, Nz] sdf values
    level: float = 0.0,
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> TriMesh:
    """Vectorized marching tetrahedra. Returns a TriMesh in world coords.

    Prefers the in-tree C++ implementation (native/sst_native.cc —
    identical 6-tet decomposition with exact edge-keyed vertex dedup);
    falls back to the pure-numpy path below when no toolchain exists."""
    grid = np.asarray(grid, np.float32)
    nx, ny, nz = grid.shape
    if min(nx, ny, nz) < 2:
        return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))

    from sdfstudio_tpu import native

    res = native.marching_tets(grid, float(level), origin=origin, spacing=spacing)
    if res is not None:
        verts, faces = res
        return TriMesh(verts, faces)

    # only process cubes whose 8 corners straddle the level
    vmin = grid
    for axis in range(3):
        sl = [slice(None)] * 3
        sl[axis] = slice(0, -1)
        sr = [slice(None)] * 3
        sr[axis] = slice(1, None)
        vmin = np.minimum(vmin[tuple(sl)], vmin[tuple(sr)])
    vmax = grid
    for axis in range(3):
        sl = [slice(None)] * 3
        sl[axis] = slice(0, -1)
        sr = [slice(None)] * 3
        sr[axis] = slice(1, None)
        vmax = np.maximum(vmax[tuple(sl)], vmax[tuple(sr)])
    active = np.argwhere((vmin < level) & (vmax >= level))  # [C, 3]
    if len(active) == 0:
        return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))

    # corner values + integer coords for active cubes: [C, 8]
    cx = active[:, 0:1] + CORNERS[None, :, 0]
    cy = active[:, 1:2] + CORNERS[None, :, 1]
    cz = active[:, 2:3] + CORNERS[None, :, 2]
    vals = grid[cx, cy, cz]  # [C, 8]
    coords = np.stack([cx, cy, cz], axis=-1).astype(np.float32)  # [C, 8, 3]

    tris_points = []
    for tet in TETS:
        tv = vals[:, tet]  # [C, 4]
        tp = coords[:, tet]  # [C, 4, 3]
        case = (
            (tv[:, 0] < level).astype(np.int32)
            | ((tv[:, 1] < level) << 1)
            | ((tv[:, 2] < level) << 2)
            | ((tv[:, 3] < level) << 3)
        )
        # interpolated point on each of the 6 tet edges: [C, 6, 3]
        a = TET_EDGES[:, 0]
        b = TET_EDGES[:, 1]
        va = tv[:, a]  # [C, 6]
        vb = tv[:, b]
        denom = vb - va
        t = np.where(np.abs(denom) > 1e-12, (level - va) / np.where(denom == 0, 1, denom), 0.5)
        t = np.clip(t, 0.0, 1.0)
        pa = tp[:, a]  # [C, 6, 3]
        pb = tp[:, b]
        epts = pa + t[..., None] * (pb - pa)  # [C, 6, 3]

        for k in range(2):
            tri_edges = TET_TRIS[case, k]  # [C, 3]
            valid = tri_edges[:, 0] >= 0
            if not np.any(valid):
                continue
            e = tri_edges[valid]  # [M, 3]
            pts = epts[valid][np.arange(e.shape[0])[:, None], e]  # [M, 3, 3]
            tris_points.append(pts)

    if not tris_points:
        return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    all_tris = np.concatenate(tris_points, axis=0)  # [T, 3, 3]
    verts = all_tris.reshape(-1, 3)
    faces = np.arange(len(verts), dtype=np.int64).reshape(-1, 3)
    verts = verts * np.asarray(spacing, np.float32) + np.asarray(origin, np.float32)
    return TriMesh(verts, faces).merge_close_vertices()


# ---------------------------------------------------------------------------
# Grid evaluation on TPU
# ---------------------------------------------------------------------------


def evaluate_sdf_grid(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],  # [N,3] -> [N]
    resolution: int,
    bounds_min: np.ndarray,
    bounds_max: np.ndarray,
    chunk: int = 131072,
) -> np.ndarray:
    """Jitted SDF evaluation over a dense grid in ONE dispatch + ONE fetch
    (reference marching_cubes.py:61-66 evaluates in 100k chunks; here the
    chunk loop runs INSIDE the program via lax.map and grid coordinates are
    generated on device — a Python chunk loop with per-chunk fetches pays
    ~5.8s/call + ~29s/fetch on the relay deployment, docs/tpu-design.md)."""
    lo = jnp.asarray(bounds_min, jnp.float32)
    hi = jnp.asarray(bounds_max, jnp.float32)
    cell = (hi - lo) / max(resolution - 1, 1)
    n = resolution**3
    n_chunks = (n + chunk - 1) // chunk

    def body(ci):
        ids = ci * chunk + jnp.arange(chunk)
        i = ids // (resolution * resolution)
        j = (ids // resolution) % resolution
        k = ids % resolution
        # tail-padding ids run past the grid; their values are sliced off
        pts = lo[None] + jnp.stack([i, j, k], axis=-1).astype(jnp.float32) * cell[None]
        return sdf_fn(pts)

    vals = jax.jit(lambda: jax.lax.map(body, jnp.arange(n_chunks)))()
    return np.asarray(vals).reshape(-1)[:n].astype(np.float32).reshape(
        resolution, resolution, resolution
    )


def get_surface_sliding(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    resolution: int = 512,
    bounding_box_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0),
    bounding_box_max: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    block_res: int = 256,
    level: float = 0.0,
    chunk: int = 131072,
) -> TriMesh:
    """Sliding-block surface extraction (reference marching_cubes.py:14-167):
    the full grid is processed in blocks so arbitrary resolutions fit in
    memory; blocks share boundary planes so the mesh is seamless."""
    assert resolution % block_res == 0 or resolution <= block_res
    bmin = np.asarray(bounding_box_min, np.float32)
    bmax = np.asarray(bounding_box_max, np.float32)
    n_blocks = max(1, resolution // block_res)
    cell = (bmax - bmin) / (resolution - 1)

    meshes = []
    for bi in range(n_blocks):
        for bj in range(n_blocks):
            for bk in range(n_blocks):
                # block covers [start, start+block_res] grid points (one
                # overlapping plane with the next block)
                i0 = np.array([bi, bj, bk]) * block_res
                i1 = np.minimum(i0 + block_res, resolution - 1)
                res_block = (i1 - i0) + 1
                lo = bmin + i0 * cell
                hi = bmin + i1 * cell
                r = int(res_block[0])
                grid = evaluate_sdf_grid(sdf_fn, r, lo, hi, chunk=chunk)
                spacing = (hi - lo) / np.maximum(res_block - 1, 1)
                mesh = marching_tetrahedra(grid, level, origin=lo, spacing=spacing)
                if len(mesh.vertices):
                    meshes.append(mesh)
    return concatenate(meshes).merge_close_vertices()


def simplify_mesh(mesh: TriMesh, target_faces: int) -> TriMesh:
    """Quadric edge-collapse decimation via the in-tree C++ implementation
    (the reference shells out to pymeshlab, marching_cubes.py:162-167).
    Returns the input unchanged when the native library is unavailable or
    the mesh is already small enough."""
    if len(mesh.faces) <= target_faces:
        return mesh
    from sdfstudio_tpu import native

    res = native.simplify_quadric(mesh.vertices, mesh.faces, target_faces)
    if res is None:
        return mesh
    verts, faces = res
    return TriMesh(verts, faces)


def get_surface_occupancy(
    occupancy_fn: Callable[[jnp.ndarray], jnp.ndarray],
    resolution: int = 512,
    bounds: float = 1.0,
    level: float = 0.5,
    chunk: int = 131072,
) -> TriMesh:
    """UniSurf occupancy-level surface (reference marching_cubes.py:170-215)."""
    return get_surface_sliding(
        occupancy_fn,
        resolution=resolution,
        bounding_box_min=(-bounds,) * 3,
        bounding_box_max=(bounds,) * 3,
        block_res=min(resolution, 256),
        level=level,
        chunk=chunk,
    )


def get_surface_sliding_with_contraction(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],  # takes CONTRACTED coords
    resolution: int = 512,
    bounding_box_min: Tuple[float, float, float] = (-2.0, -2.0, -2.0),
    bounding_box_max: Tuple[float, float, float] = (2.0, 2.0, 2.0),
    visibility_mask_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    block_res: int = 256,
    level: float = 0.0,
    order: Optional[float] = np.inf,
    chunk: int = 131072,
) -> TriMesh:
    """Unbounded-scene extraction in contracted [-2,2] space, vertices
    inverse-contracted back to world (reference marching_cubes.py:218-341).
    ``visibility_mask_fn`` zeroes unobserved space (the reference splats
    train-ray samples into a 512^3 grid, base_pipeline.py:370-424)."""

    def masked_sdf(pts):
        sdf = sdf_fn(pts)
        if visibility_mask_fn is not None:
            vis = visibility_mask_fn(pts)
            # outside the visibility mask force positive (empty) sdf
            sdf = jnp.where(vis > 0.5, sdf, jnp.abs(sdf) + 1.0)
        return sdf

    mesh = get_surface_sliding(
        masked_sdf,
        resolution=resolution,
        bounding_box_min=bounding_box_min,
        bounding_box_max=bounding_box_max,
        block_res=block_res,
        level=level,
        chunk=chunk,
    )
    if len(mesh.vertices):
        verts = np.asarray(
            contract_inv(jnp.asarray(mesh.vertices), order=order)
        )
        mesh = TriMesh(verts, mesh.faces, mesh.colors, mesh.normals)
    return mesh
