"""Python bridge to the native C++ mesh-processing runtime (native/meshops.cpp).

Covers the reference's native preprocessing:
  * rebuild_topology (src/rebuild_topology.cpp) -> weld_mesh
  * automatic_uv_map / xatlas (src/automatic_uv_map.cpp) -> compute_uvs
  * fast OBJ geometry scan (load_serialized-adjacent bulk IO)

The shared library is compiled on first use with the system toolchain and
cached next to the package.  ctypes is used for the C ABI (no pybind11 in
this environment).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None


def _build_library() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "native", "meshops.cpp")
    out = os.path.join(here, "_libmeshops.so")
    if (not os.path.exists(out)) or (
        os.path.getmtime(out) < os.path.getmtime(src)
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", out, src],
            check=True,
        )
    return out


def _lib():
    global _LIB
    if _LIB is None:
        path = _build_library()
        lib = ctypes.CDLL(path)
        lib.weld_vertices.restype = ctypes.c_int64
        lib.weld_vertices.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.atlas_uv.restype = ctypes.c_int64
        lib.atlas_uv.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.obj_count.restype = ctypes.c_int32
        lib.obj_count.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.obj_read.restype = ctypes.c_int32
        lib.obj_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    return _LIB


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def weld_mesh(vertices, indices, uvs=None, eps: float = 1e-6):
    """Weld duplicate vertices so edge extraction sees shared faces
    (reference rebuild_topology, src/rebuild_topology.cpp:9-50).

    Returns (vertices', indices', uvs' or None)."""
    v = np.ascontiguousarray(np.asarray(vertices, np.float32))
    f = np.ascontiguousarray(np.asarray(indices, np.int32))
    u = None if uvs is None else np.ascontiguousarray(np.asarray(uvs, np.float32))
    n = v.shape[0]
    remap = np.empty((n,), np.int32)
    out_v = np.empty_like(v)
    out_u = np.empty_like(u) if u is not None else np.empty((0, 2), np.float32)
    lib = _lib()
    count = lib.weld_vertices(
        _fptr(v), n,
        _fptr(u) if u is not None else None,
        ctypes.c_float(eps), _iptr(remap), _fptr(out_v), _fptr(out_u),
    )
    new_v = out_v[:count].copy()
    new_f = remap[f]
    new_u = out_u[:count].copy() if u is not None else None
    return new_v, new_f, new_u


def weld_ids(vertices, eps: float) -> np.ndarray:
    """(V,) int32 canonical ORIGINAL vertex id per vertex under an eps
    position weld — a keying map only; geometry/UVs/normals untouched.

    Used by the loaders so edge extraction sees shared faces on meshes
    exported with per-face vertex splits at reduced precision (the
    reference rebuilds topology at load, src/rebuild_topology.cpp:9-50 /
    pyredner/load_mitsuba.py:296; here the weld feeds only
    edge._weld_vertex_ids' silhouette keying)."""
    v = np.ascontiguousarray(np.asarray(vertices, np.float32))
    n = v.shape[0]
    remap = np.empty((n,), np.int32)
    out_v = np.empty_like(v)
    lib = _lib()
    count = lib.weld_vertices(
        _fptr(v), n, None, ctypes.c_float(eps), _iptr(remap), _fptr(out_v),
        _fptr(np.empty((0, 2), np.float32)),
    )
    # remap points at FIRST-occurrence welded slots, so the first
    # original vertex of each group is its representative.
    rep = np.full((count,), n, np.int64)
    np.minimum.at(rep, remap, np.arange(n))
    return rep[remap].astype(np.int32)


def compute_uvs(vertices, indices, normal_cos_threshold: float = 0.75):
    """Automatic UV unwrap (reference pyredner.compute_uvs backed by xatlas,
    pyredner/shape.py:279-326): normal-clustered charts, planar projection,
    shelf packing.  Returns (uvs (3F, 2), uv_indices (F, 3))."""
    v = np.ascontiguousarray(np.asarray(vertices, np.float32))
    f = np.ascontiguousarray(np.asarray(indices, np.int32))
    F = f.shape[0]
    out_uvs = np.empty((3 * F, 2), np.float32)
    out_idx = np.empty((F, 3), np.int32)
    lib = _lib()
    lib.atlas_uv(
        _fptr(v), v.shape[0], _iptr(f), F,
        ctypes.c_float(normal_cos_threshold), _fptr(out_uvs), _iptr(out_idx),
    )
    return out_uvs, out_idx


def load_obj_fast(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Native two-pass OBJ geometry scan (positions + triangulated faces).

    ~10x faster than the Python parser for large meshes; attributes and
    materials still come from redner_tpu.io.obj.load_obj."""
    lib = _lib()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.obj_count(path.encode(), ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0:
        raise IOError(f"cannot open {path}")
    v = np.empty((nv.value, 3), np.float32)
    f = np.empty((nf.value, 3), np.int32)
    rc = lib.obj_read(path.encode(), _fptr(v), _iptr(f))
    if rc != 0:
        raise IOError(f"cannot read {path}")
    return v, f
