"""ctypes bindings for the native mesh runtime (libtds_mesh.so).

Builds on demand (g++ is a baked-in toolchain dependency); a pure-Python
fallback keeps the API available if compilation is impossible.

API:
- load_obj(text) -> (vertices (n,3) f64, triangles (m,3) i32)
- mesh_mass_properties(vertices, triangles, density) -> (mass, com, inertia)
- marching_cubes(sdf_grid, origin, dx, iso) -> (t, 3, 3) triangle soup
"""

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtds_mesh.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["/bin/sh", os.path.join(_DIR, "build.sh")],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tds_obj_parse.restype = ctypes.c_int
    lib.tds_obj_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.tds_obj_get.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.tds_obj_free.argtypes = [ctypes.c_int]
    lib.tds_mesh_mass_properties.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.tds_marching_cubes.restype = ctypes.c_int
    lib.tds_marching_cubes.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def load_obj(text: str) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    if lib is None:
        return _load_obj_py(text)
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    handle = lib.tds_obj_parse(text.encode(), ctypes.byref(nv), ctypes.byref(nt))
    if handle < 0:
        raise ValueError("failed to parse OBJ")
    verts = np.empty((nv.value, 3), dtype=np.float64)
    tris = np.empty((nt.value, 3), dtype=np.int32)
    lib.tds_obj_get(
        handle,
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    lib.tds_obj_free(handle)
    return verts, tris


def load_obj_file(path: str):
    with open(path) as f:
        return load_obj(f.read())


def mesh_mass_properties(vertices, triangles, density: float = 1000.0):
    """(mass, com (3,), inertia about COM (3,3)) by signed-tet decomposition."""
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    t = np.ascontiguousarray(triangles, dtype=np.int32)
    lib = get_lib()
    if lib is None:
        return _mass_properties_py(v, t, density)
    mass = ctypes.c_double()
    com = np.zeros(3)
    inertia = np.zeros((3, 3))
    lib.tds_mesh_mass_properties(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(v),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(t),
        density,
        ctypes.byref(mass),
        com.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        inertia.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return mass.value, com, inertia


def marching_cubes(sdf, origin, dx: float, iso: float = 0.0,
                   max_triangles: int = 500000) -> np.ndarray:
    """Isosurface triangle soup (t, 3, 3) of a dense SDF grid indexed
    [z, y, x] (x-fastest memory order)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native mesh library unavailable")
    sdf = np.ascontiguousarray(sdf, dtype=np.float64)
    nz, ny, nx = sdf.shape
    out = np.empty((max_triangles, 3, 3), dtype=np.float64)
    n = lib.tds_marching_cubes(
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nx, ny, nz,
        float(origin[0]), float(origin[1]), float(origin[2]), float(dx),
        float(iso),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_triangles,
    )
    return out[:n]


# ---------------- pure-Python fallbacks -----------------------------------
def _load_obj_py(text: str):
    verts, tris = [], []
    for line in text.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v" and len(parts) >= 4:
            verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
        elif parts[0] == "f" and len(parts) >= 4:
            idx = [int(p.split("/")[0]) for p in parts[1:]]
            idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
            for k in range(2, len(idx)):
                tris.append([idx[0], idx[k - 1], idx[k]])
    return np.asarray(verts, dtype=np.float64), np.asarray(tris, dtype=np.int32)


def _mass_properties_py(v, t, density):
    a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    det = np.einsum("ij,ij->i", a, np.cross(b, c))
    vol = det.sum() / 6.0
    com = ((det[:, None] / 6.0) * (a + b + c) / 4.0).sum(0) / max(vol, 1e-30)
    mass = density * vol
    # fall back to a coarse inertia (solid about COM from bounding box)
    ext = v.max(0) - v.min(0)
    k = mass / 12.0
    inertia = np.diag(
        [
            k * (ext[1] ** 2 + ext[2] ** 2),
            k * (ext[0] ** 2 + ext[2] ** 2),
            k * (ext[0] ** 2 + ext[1] ** 2),
        ]
    )
    return mass, com, inertia
