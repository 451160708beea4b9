"""sst-texture: bake a textured OBJ from a trained field + mesh.

Functional spec: reference nerfstudio/exporter/texture_utils.py:210-326 +
scripts/texture.py (xatlas UV unwrap + per-texel field color bake). Two
unwrap methods, mirroring the reference's ``xatlas`` / ``custom`` pair:

- ``charts`` (default): in-tree seam-aware chart unwrap — normal-coherent
  chart growing + planar parameterization + shelf packing + gutter
  dilation (utils/unwrap.py; the xatlas replacement);
- ``per-triangle``: each triangle in its own texture cell (the reference's
  ``custom`` unwrap, texture_utils.py:78-207).

Baking evaluates the field's color network at texel surface points with
view direction along the surface normal.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _field_shader(trainer):
    """jitted (points, dirs, grads) -> rgb through the trained color net."""
    import jax
    import jax.numpy as jnp

    from sdfstudio_tpu.fields.sdf_field import SDFFieldNet

    params = trainer.state.params["field"]
    field = trainer.model.field

    @jax.jit
    def shade(points, dirs, grads):
        geonet = field.geonetwork_fn(params)
        h = geonet(points)
        feat = h[..., 1:]
        cam = jnp.zeros(points.shape[:-1], jnp.int32)
        return field.module.apply(
            {"params": params}, points, dirs, grads, feat, cam, False, False,
            method=SDFFieldNet.colors,
        )

    return shade


def bake_texture_charts(trainer, mesh, texture_size: int = 2048):
    """Chart-unwrapped bake: returns (uvs [F, 3, 2], texture [T, T, 3])."""
    import jax.numpy as jnp

    from sdfstudio_tpu.utils.unwrap import (
        dilate_texture,
        rasterize_atlas,
        unwrap_charts,
    )

    verts = np.asarray(mesh.vertices, np.float64)
    faces = np.asarray(mesh.faces, np.int64)
    uvs, _ = unwrap_charts(verts, faces, texture_size=texture_size)
    face_id, bary, covered = rasterize_atlas(uvs, texture_size)

    tri = verts[faces]  # [F, 3, 3]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    ys, xs = np.nonzero(covered)
    f = face_id[ys, xs]
    w = bary[ys, xs].astype(np.float64)  # [N, 3]
    pts = np.einsum("nk,nkd->nd", w, tri[f]).astype(np.float32)
    nrm = n[f].astype(np.float32)

    shade = _field_shader(trainer)
    texture = np.zeros((texture_size, texture_size, 3), np.float32)
    chunk = 131072
    for i0 in range(0, len(pts), chunk):
        sl = slice(i0, min(i0 + chunk, len(pts)))
        rgb = np.asarray(
            shade(jnp.asarray(pts[sl]), jnp.asarray(-nrm[sl]), jnp.asarray(nrm[sl]))
        )
        texture[ys[sl], xs[sl]] = rgb
    texture = dilate_texture(np.clip(texture, 0, 1), covered)

    out_uvs = uvs.copy()
    out_uvs[..., 1] = 1.0 - out_uvs[..., 1]  # OBJ v-flip
    return out_uvs, texture


def bake_texture(trainer, mesh, px_per_tri: int = 8, texture_size: int = 2048):
    """Returns (uv [V_f, 2] per face-corner, texture [T, T, 3])."""
    import jax
    import jax.numpy as jnp

    from sdfstudio_tpu.fields.sdf_field import SDFFieldNet

    model = trainer.model
    params = trainer.state.params["field"]
    field = model.field

    F = len(mesh.faces)
    cells = int(np.ceil(np.sqrt(F)))
    cell_px = max(texture_size // cells, 2)
    tex_size = cells * cell_px

    # per-cell barycentric sample grid (lower-left triangle of each cell)
    g = np.linspace(0.5 / cell_px, 1 - 0.5 / cell_px, cell_px)
    bu, bv = np.meshgrid(g, g, indexing="xy")
    inside = bu + bv <= 1.0 + 1.0 / cell_px
    bu_c = np.where(inside, bu, 1 - bu)
    bv_c = np.where(inside, bv, 1 - bv)

    tri_pts = mesh.vertices[mesh.faces]  # [F, 3, 3]
    v0, v1, v2 = tri_pts[:, 0], tri_pts[:, 1], tri_pts[:, 2]
    normals = np.cross(v1 - v0, v2 - v0)
    normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)

    # surface points per texel: [F, cell_px, cell_px, 3]
    pts = (
        v0[:, None, None]
        + bu_c[None, ..., None] * (v1 - v0)[:, None, None]
        + bv_c[None, ..., None] * (v2 - v0)[:, None, None]
    )

    @jax.jit
    def shade(points, dirs, grads):
        geonet = field.geonetwork_fn(params)
        h = geonet(points)
        feat = h[..., 1:]
        cam = jnp.zeros(points.shape[:-1], jnp.int32)
        return field.module.apply(
            {"params": params}, points, dirs, grads, feat, cam, False, False,
            method=SDFFieldNet.colors,
        )

    texture = np.zeros((tex_size, tex_size, 3), np.float32)
    chunk_f = max(1, 131072 // (cell_px * cell_px))
    for f0 in range(0, F, chunk_f):
        f1 = min(f0 + chunk_f, F)
        p = pts[f0:f1].reshape(-1, 3).astype(np.float32)
        n = np.repeat(normals[f0:f1], cell_px * cell_px, axis=0).astype(np.float32)
        rgb = np.asarray(shade(jnp.asarray(p), jnp.asarray(-n), jnp.asarray(n)))
        rgb = rgb.reshape(f1 - f0, cell_px, cell_px, 3)
        for i, f in enumerate(range(f0, f1)):
            cy, cx = divmod(f, cells)
            texture[
                cy * cell_px : (cy + 1) * cell_px, cx * cell_px : (cx + 1) * cell_px
            ] = rgb[i]

    # per-face-corner UVs: triangle (0,0), (1,0), (0,1) within its cell
    uvs = np.zeros((F, 3, 2), np.float32)
    for f in range(F):
        cy, cx = divmod(f, cells)
        base = np.array([cx * cell_px + 0.5, cy * cell_px + 0.5])
        span = cell_px - 1.0
        uvs[f, 0] = base
        uvs[f, 1] = base + [span, 0]
        uvs[f, 2] = base + [0, span]
    uvs /= tex_size
    uvs[..., 1] = 1.0 - uvs[..., 1]  # OBJ v-flip
    return uvs, np.clip(texture, 0, 1)


def export_textured_obj(
    trainer, mesh, out_dir: Path, name: str = "mesh", unwrap: str = "charts",
    texture_size: int = 2048,
):
    import imageio.v2 as imageio

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if unwrap == "charts":
        uvs, texture = bake_texture_charts(trainer, mesh, texture_size=texture_size)
    else:
        uvs, texture = bake_texture(trainer, mesh, texture_size=texture_size)
    imageio.imwrite(out_dir / f"{name}.png", (texture * 255).astype(np.uint8))
    (out_dir / f"{name}.mtl").write_text(
        f"newmtl material0\nKd 1 1 1\nmap_Kd {name}.png\n"
    )
    with open(out_dir / f"{name}.obj", "w") as f:
        f.write(f"mtllib {name}.mtl\nusemtl material0\n")
        for v in mesh.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face_uv in uvs.reshape(-1, 2):
            f.write(f"vt {face_uv[0]} {face_uv[1]}\n")
        for i, face in enumerate(mesh.faces):
            a, b, c = face + 1
            t = 3 * i + 1
            f.write(f"f {a}/{t} {b}/{t + 1} {c}/{t + 2}\n")
    print(f"wrote textured OBJ to {out_dir / (name + '.obj')}")


def entrypoint():
    from sdfstudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor SST_JAX_PLATFORM (sitecustomize pins axon)

    p = argparse.ArgumentParser()
    p.add_argument("--load-config", type=Path, required=True)
    p.add_argument("--input-mesh", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, default=Path("textured"))
    p.add_argument("--unwrap", choices=["charts", "per-triangle"], default="charts",
                   help="charts = seam-aware chart atlas (xatlas analog); "
                   "per-triangle = one texture cell per triangle")
    p.add_argument("--texture-size", type=int, default=2048)
    a = p.parse_args()
    from sdfstudio_tpu.engine.setup import eval_setup
    from sdfstudio_tpu.utils.mesh_io import read_ply

    _, trainer = eval_setup(a.load_config)
    mesh = read_ply(a.input_mesh)
    export_textured_obj(trainer, mesh, a.output_dir, unwrap=a.unwrap,
                        texture_size=a.texture_size)


if __name__ == "__main__":
    entrypoint()
