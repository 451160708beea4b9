"""ctypes bindings for the in-tree native (C++) runtime components.

``native/sst_native.cc`` implements marching tetrahedra with edge-keyed
vertex dedup, quadric edge-collapse mesh simplification, and TSDF fusion —
the in-tree equivalents of the reference's external native deps (skimage
marching_cubes, pymeshlab decimation, torch TSDF loops; see reference
nerfstudio/utils/marching_cubes.py:133,162-167 and exporter/tsdf_utils.py).

The shared library is compiled on demand with g++ (cached by source hash
under ``~/.cache/sdfstudio_tpu``); every entry point has a pure-numpy
fallback in the caller, so an environment without a toolchain still works.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "sst_native.cc"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    if not _SRC.exists():
        return None
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("SST_NATIVE_CACHE", Path.home() / ".cache" / "sdfstudio_tpu")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    out = cache_dir / f"libsst_native_{tag}.so"
    if out.exists():
        return out
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td) / out.name
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-o", str(tmp), str(_SRC),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        except (OSError, subprocess.SubprocessError):
            return None
        os.replace(tmp, out)
    return out


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("SST_DISABLE_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(i64)
    lib.sst_free.argtypes = [ctypes.c_void_p]
    lib.sst_marching_tets.argtypes = [
        f32p, i64, i64, i64, ctypes.c_float, f32p, f32p,
        ctypes.POINTER(f32p), i64p, ctypes.POINTER(i64p), i64p,
    ]
    lib.sst_simplify_quadric.argtypes = [
        f32p, i64, i64p, i64, i64,
        ctypes.POINTER(f32p), i64p, ctypes.POINTER(i64p), i64p,
    ]
    lib.sst_tsdf_integrate.argtypes = [
        f32p, f32p, i64, i64, i64, f32p, ctypes.c_float, f32p, f32p, f32p,
        i64, i64, ctypes.c_float,
    ]
    _lib = lib
    return _lib


def _take_mesh(lib, pverts, nv, pfaces, nf) -> Tuple[np.ndarray, np.ndarray]:
    nv, nf = nv.value, nf.value
    if nv:
        verts = np.ctypeslib.as_array(pverts, shape=(nv, 3)).copy()
        lib.sst_free(pverts)
    else:
        verts = np.zeros((0, 3), np.float32)
    if nf:
        faces = np.ctypeslib.as_array(pfaces, shape=(nf, 3)).copy()
        lib.sst_free(pfaces)
    else:
        faces = np.zeros((0, 3), np.int64)
    return verts, faces


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def marching_tets(
    grid: np.ndarray, level: float = 0.0,
    origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0),
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native marching tetrahedra; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    grid = np.ascontiguousarray(grid, np.float32)
    o = np.asarray(origin, np.float32)
    s = np.asarray(spacing, np.float32)
    pverts = ctypes.POINTER(ctypes.c_float)()
    pfaces = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    rc = lib.sst_marching_tets(
        _f32p(grid), *grid.shape, ctypes.c_float(level), _f32p(o), _f32p(s),
        ctypes.byref(pverts), ctypes.byref(nv), ctypes.byref(pfaces), ctypes.byref(nf),
    )
    if rc != 0:
        return None
    return _take_mesh(lib, pverts, nv, pfaces, nf)


def simplify_quadric(
    verts: np.ndarray, faces: np.ndarray, target_faces: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Garland-Heckbert quadric edge-collapse down to ~target_faces faces."""
    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int64)
    pverts = ctypes.POINTER(ctypes.c_float)()
    pfaces = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    rc = lib.sst_simplify_quadric(
        _f32p(verts), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(faces),
        ctypes.c_int64(int(target_faces)),
        ctypes.byref(pverts), ctypes.byref(nv), ctypes.byref(pfaces), ctypes.byref(nf),
    )
    if rc != 0:
        return None
    return _take_mesh(lib, pverts, nv, pfaces, nf)


def tsdf_integrate(
    tsdf: np.ndarray, weights: np.ndarray, origin: np.ndarray, voxel_size: float,
    K: np.ndarray, w2c: np.ndarray, depth: np.ndarray, trunc: float,
) -> bool:
    """Fuse one depth map into (tsdf, weights) in place. False if no lib."""
    lib = get_lib()
    if lib is None:
        return False
    assert tsdf.flags.c_contiguous and tsdf.dtype == np.float32
    assert weights.flags.c_contiguous and weights.dtype == np.float32
    o = np.asarray(origin, np.float32)
    Kf = np.ascontiguousarray(K, np.float32)
    w2cf = np.ascontiguousarray(w2c, np.float32)
    d = np.ascontiguousarray(depth, np.float32)
    lib.sst_tsdf_integrate(
        _f32p(tsdf), _f32p(weights), *tsdf.shape, _f32p(o),
        ctypes.c_float(voxel_size), _f32p(Kf), _f32p(w2cf), _f32p(d),
        ctypes.c_int64(d.shape[0]), ctypes.c_int64(d.shape[1]), ctypes.c_float(trunc),
    )
    return True
