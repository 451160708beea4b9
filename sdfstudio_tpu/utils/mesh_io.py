"""Minimal mesh container + PLY/OBJ io (replaces trimesh/pymeshlab/open3d,
which are unavailable in this environment — reference
utils/marching_cubes.py:148-167 uses trimesh+pymeshlab)."""
from __future__ import annotations

import dataclasses
import struct
from pathlib import Path
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class TriMesh:
    vertices: np.ndarray  # [V, 3] float
    faces: np.ndarray  # [F, 3] int
    colors: Optional[np.ndarray] = None  # [V, 3] float in [0,1]
    normals: Optional[np.ndarray] = None  # [V, 3]

    def merge_close_vertices(self, digits: int = 6) -> "TriMesh":
        """Weld duplicate vertices (trimesh merge_vertices equivalent)."""
        if len(self.vertices) == 0:
            return self
        key = np.round(self.vertices, digits)
        _, idx, inv = np.unique(key, axis=0, return_index=True, return_inverse=True)
        verts = self.vertices[idx]
        faces = inv[self.faces]
        # drop degenerate faces
        good = (
            (faces[:, 0] != faces[:, 1])
            & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2])
        )
        return TriMesh(
            vertices=verts,
            faces=faces[good],
            colors=self.colors[idx] if self.colors is not None else None,
            normals=self.normals[idx] if self.normals is not None else None,
        )

    def export(self, path: Path):
        path = Path(path)
        if path.suffix.lower() == ".obj":
            self._write_obj(path)
        else:
            self._write_ply(path)

    def _write_obj(self, path: Path):
        with open(path, "w") as f:
            for v in self.vertices:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            if self.normals is not None:
                for n in self.normals:
                    f.write(f"vn {n[0]} {n[1]} {n[2]}\n")
            for face in self.faces + 1:
                f.write(f"f {face[0]} {face[1]} {face[2]}\n")

    def _write_ply(self, path: Path):
        """Binary little-endian PLY."""
        V, F = len(self.vertices), len(self.faces)
        has_color = self.colors is not None
        has_normal = self.normals is not None
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {V}"]
        header += ["property float x", "property float y", "property float z"]
        if has_normal:
            header += ["property float nx", "property float ny", "property float nz"]
        if has_color:
            header += [
                "property uchar red",
                "property uchar green",
                "property uchar blue",
            ]
        header += [f"element face {F}", "property list uchar int vertex_indices", "end_header"]
        with open(path, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            cols = [self.vertices.astype("<f4")]
            if has_normal:
                cols.append(self.normals.astype("<f4"))
            vert_bytes = np.concatenate(cols, axis=1).tobytes()
            if has_color:
                rgb = (np.clip(self.colors, 0, 1) * 255).astype(np.uint8)
                # interleave: rebuild row-wise
                float_part = np.concatenate(cols, axis=1)
                rows = bytearray()
                for i in range(V):
                    rows += float_part[i].astype("<f4").tobytes()
                    rows += rgb[i].tobytes()
                f.write(bytes(rows))
            else:
                f.write(vert_bytes)
            face_dtype = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
            farr = np.empty(F, dtype=face_dtype)
            farr["n"] = 3
            farr["idx"] = self.faces.astype("<i4")
            f.write(farr.tobytes())


def read_ply(path: Path) -> TriMesh:
    """Read binary-LE or ascii PLY written by :meth:`TriMesh.export`."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode().strip()
            header.append(line)
            if line == "end_header":
                break
        nv = int([l for l in header if l.startswith("element vertex")][0].split()[-1])
        face_el = [l for l in header if l.startswith("element face")]
        # point clouds (e.g. exported sparse voxels) carry no face element
        nf = int(face_el[0].split()[-1]) if face_el else 0
        vprops = []
        in_vertex = False
        for l in header:
            if l.startswith("element vertex"):
                in_vertex = True
                continue
            if l.startswith("element"):
                in_vertex = False
            if in_vertex and l.startswith("property"):
                vprops.append(tuple(l.split()[1:]))
        fmt = []
        for typ, name in vprops:
            fmt.append((name, "<f4" if typ == "float" else "u1"))
        vdt = np.dtype(fmt)
        vdata = np.frombuffer(f.read(nv * vdt.itemsize), dtype=vdt)
        verts = np.stack([vdata["x"], vdata["y"], vdata["z"]], axis=1)
        normals = None
        if "nx" in vdt.names:
            normals = np.stack([vdata["nx"], vdata["ny"], vdata["nz"]], axis=1)
        colors = None
        if "red" in vdt.names:
            colors = np.stack([vdata["red"], vdata["green"], vdata["blue"]], axis=1) / 255.0
        fdt = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
        fdata = np.frombuffer(f.read(nf * fdt.itemsize), dtype=fdt)
        return TriMesh(vertices=verts, faces=fdata["idx"].copy(), colors=colors, normals=normals)


def concatenate(meshes: List[TriMesh]) -> TriMesh:
    meshes = [m for m in meshes if len(m.vertices)]
    if not meshes:
        return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    offsets = np.cumsum([0] + [len(m.vertices) for m in meshes[:-1]])
    verts = np.concatenate([m.vertices for m in meshes])
    faces = np.concatenate([m.faces + o for m, o in zip(meshes, offsets)])
    colors = None
    if all(m.colors is not None for m in meshes):
        colors = np.concatenate([m.colors for m in meshes])
    normals = None
    if all(m.normals is not None for m in meshes):
        normals = np.concatenate([m.normals for m in meshes])
    return TriMesh(verts, faces, colors, normals)
