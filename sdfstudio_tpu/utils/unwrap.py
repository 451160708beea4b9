"""Chart-based UV unwrapping (in-tree xatlas replacement).

Functional spec: reference nerfstudio/exporter/texture_utils.py:210-326
(``unwrap_mesh_with_xatlas``) — seam-aware charts instead of the
per-triangle atlas fallback. Pipeline:

1. chart growing: BFS over face adjacency, admitting faces whose normal
   stays within ``angle_threshold`` of the chart seed normal (xatlas's
   proxy-fit criterion, simplified) up to ``max_chart_faces``;
2. parameterization: orthographic projection of each chart onto its
   area-weighted mean-normal plane (charts are near-planar by construction,
   so projection distortion is bounded by the angle threshold);
3. packing: per-chart principal-axis rotation to a tight rect, global
   scale so summed rect area fills the atlas, then shelf packing with a
   ``gutter``-texel margin.

Everything is numpy; no external dependency. Vertices on chart boundaries
are duplicated per chart (UV seams), as with any atlas unwrap.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def face_adjacency(faces: np.ndarray) -> List[List[int]]:
    """Adjacent faces (shared edge) per face."""
    edges = {}
    adj: List[List[int]] = [[] for _ in range(len(faces))]
    for fi, (a, b, c) in enumerate(faces):
        for u, v in ((a, b), (b, c), (c, a)):
            key = (min(u, v), max(u, v))
            other = edges.get(key)
            if other is None:
                edges[key] = fi
            else:
                adj[fi].append(other)
                adj[other].append(fi)
    return adj


def grow_charts(
    vertices: np.ndarray,
    faces: np.ndarray,
    angle_threshold_deg: float = 60.0,
    max_chart_faces: int = 512,
) -> np.ndarray:
    """Assign each face to a chart id [F] via normal-coherent BFS."""
    v = vertices[faces]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    norms = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(norms, 1e-12)
    adj = face_adjacency(faces)
    cos_thresh = np.cos(np.deg2rad(angle_threshold_deg))

    chart = np.full(len(faces), -1, np.int32)
    order = np.argsort(-norms[:, 0])  # seed large faces first
    next_chart = 0
    from collections import deque

    for seed in order:
        if chart[seed] >= 0:
            continue
        cid = next_chart
        next_chart += 1
        chart[seed] = cid
        seed_n = n[seed]
        size = 1
        q = deque(adj[seed])
        while q and size < max_chart_faces:
            f = q.popleft()
            if chart[f] >= 0:
                continue
            if np.dot(n[f], seed_n) < cos_thresh:
                continue
            chart[f] = cid
            size += 1
            q.extend(adj[f])
    return chart


def _project_chart(vertices: np.ndarray, faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Project one chart's faces onto its mean-normal plane.

    Returns (uv2d [F_c, 3, 2] per face-corner, face normals [F_c, 3])."""
    tri = vertices[faces]  # [F_c, 3, 3]
    e1, e2 = tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
    n = np.cross(e1, e2)
    areas2 = np.linalg.norm(n, axis=-1)
    mean_n = (n).sum(axis=0)
    mn = np.linalg.norm(mean_n)
    if mn < 1e-12:
        mean_n = n[np.argmax(areas2)]
        mn = np.linalg.norm(mean_n)
    mean_n = mean_n / mn
    # orthonormal tangent frame
    a = np.array([1.0, 0.0, 0.0]) if abs(mean_n[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    t1 = np.cross(mean_n, a)
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(mean_n, t1)
    uv = np.stack([tri @ t1, tri @ t2], axis=-1)  # [F_c, 3, 2]
    return uv, n / np.maximum(areas2[:, None], 1e-12)


def _principal_rect(uv_flat: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rotate 2D points to their principal axes; return (rotated, lo, size)."""
    c = uv_flat.mean(axis=0)
    x = uv_flat - c
    cov = x.T @ x
    _, vecs = np.linalg.eigh(cov)
    rot = x @ vecs  # principal frame
    lo = rot.min(axis=0)
    size = rot.max(axis=0) - lo
    return rot - lo, lo, np.maximum(size, 1e-9)


def unwrap_charts(
    vertices: np.ndarray,
    faces: np.ndarray,
    texture_size: int = 2048,
    angle_threshold_deg: float = 60.0,
    max_chart_faces: int = 512,
    gutter: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Chart-unwrap a mesh into a square atlas.

    Returns:
        uvs: [F, 3, 2] per-face-corner UV in [0, 1] (u right, v up).
        chart_ids: [F] chart id per face.
    """
    chart = grow_charts(vertices, faces, angle_threshold_deg, max_chart_faces)
    n_charts = int(chart.max()) + 1

    # project + rect-fit each chart
    rects = []  # (w, h, cid, uv_local [F_c,3,2], face_idx)
    for cid in range(n_charts):
        fidx = np.nonzero(chart == cid)[0]
        uv, _ = _project_chart(vertices, faces[fidx])
        flat, _, _ = _principal_rect(uv.reshape(-1, 2))
        uv_local = flat.reshape(-1, 3, 2)
        size = uv_local.reshape(-1, 2).max(axis=0)
        # landscape orientation packs better on shelves
        if size[1] > size[0]:
            uv_local = uv_local[..., ::-1]
            size = size[::-1]
        rects.append((size[0], size[1], cid, uv_local, fidx))

    # global scale: charts fill ~75% of the atlas area (leaves shelf slack)
    total_area = sum(w * h for w, h, *_ in rects)
    px_per_unit = texture_size * np.sqrt(0.75 / max(total_area, 1e-12))
    g = gutter

    # shelf packing, tallest first
    rects.sort(key=lambda r: -r[1])
    uvs = np.zeros((len(faces), 3, 2), np.float64)
    for _attempt in range(8):
        ok = True
        x, y, shelf_h = g, g, 0.0
        for w, h, cid, uv_local, fidx in rects:
            wp, hp = w * px_per_unit, h * px_per_unit
            if x + wp + g > texture_size:  # new shelf
                x = g
                y += shelf_h + g
                shelf_h = 0.0
            if y + hp + g > texture_size:
                ok = False
                break
            uvs[fidx] = (uv_local * px_per_unit + np.array([x, y])) / texture_size
            x += wp + g
            shelf_h = max(shelf_h, hp)
        if ok:
            break
        px_per_unit *= 0.9  # shrink and repack
    else:
        raise RuntimeError("unwrap_charts: packing failed after 8 attempts")
    return uvs.astype(np.float32), chart


def rasterize_atlas(
    uvs: np.ndarray, texture_size: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rasterize face coverage of the atlas.

    Returns:
        face_id: [T, T] int32 face index per texel (-1 = empty).
        bary: [T, T, 3] barycentric coords of the texel center.
        covered: [T, T] bool.
    """
    T = texture_size
    face_id = np.full((T, T), -1, np.int32)
    bary = np.zeros((T, T, 3), np.float32)
    uv_px = uvs * T - 0.5  # texel-center coordinates
    mins = np.clip(np.floor(uv_px.min(axis=1)).astype(int), 0, T - 1)
    maxs = np.clip(np.ceil(uv_px.max(axis=1)).astype(int) + 1, 0, T)
    for f in range(len(uvs)):
        x0, y0 = mins[f]
        x1, y1 = maxs[f]
        if x1 <= x0 or y1 <= y0:
            continue
        gx, gy = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1), indexing="xy")
        p = np.stack([gx, gy], axis=-1).astype(np.float64)  # [h, w, 2]
        a, b, c = uv_px[f, 0], uv_px[f, 1], uv_px[f, 2]
        v0, v1 = b - a, c - a
        den = v0[0] * v1[1] - v0[1] * v1[0]
        if abs(den) < 1e-12:
            continue
        d = p - a
        wb = (d[..., 0] * v1[1] - d[..., 1] * v1[0]) / den
        wc = (d[..., 1] * v0[0] - d[..., 0] * v0[1]) / den
        wa = 1.0 - wb - wc
        eps = -1e-6
        inside = (wa >= eps) & (wb >= eps) & (wc >= eps)
        ys, xs = gy[inside], gx[inside]
        face_id[ys, xs] = f
        bary[ys, xs] = np.stack([wa[inside], wb[inside], wc[inside]], axis=-1)
    return face_id, bary, face_id >= 0


def dilate_texture(texture: np.ndarray, covered: np.ndarray, iterations: int = 4) -> np.ndarray:
    """Bleed covered texel colors into the gutter (prevents seam artifacts
    under bilinear sampling / mipmapping)."""
    tex = texture.copy()
    cov = covered.copy()
    for _ in range(iterations):
        if cov.all():
            break
        acc = np.zeros_like(tex)
        cnt = np.zeros(cov.shape, np.float32)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted = np.roll(cov, (dy, dx), axis=(0, 1))
            tshift = np.roll(tex, (dy, dx), axis=(0, 1))
            m = shifted & ~cov
            acc[m] += tshift[m]
            cnt[m] += 1.0
        newly = cnt > 0
        acc[newly] /= cnt[newly, None]
        tex[newly & ~cov] = acc[newly & ~cov]
        cov = cov | newly
    return tex
