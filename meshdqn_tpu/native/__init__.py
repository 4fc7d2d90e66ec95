"""Native (C++) host-side kernels, loaded via ctypes.

The reference's host-side compute is all native through its dependencies
(dolfin mesh ops in C++, Qhull via scipy — SURVEY.md §2b); this package
provides our equivalents: mesh smoothing and Delaunay re-triangulation.
Built lazily with g++ on first use (no pybind11 in the image; plain C ABI);
callers fall back to the pure-NumPy/scipy implementations when the
toolchain is unavailable, so the framework never hard-depends on a compiler
at runtime.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc")
_LIB_PATH = os.path.join(_DIR, "_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    sources = [
        os.path.join(_SRC, f)
        for f in ("smooth.cpp", "delaunay.cpp", "geometry.cpp")
    ]
    # Compile to a temp path and os.replace: a rebuild must never truncate
    # the .so in place while another live process (e.g. the training loop)
    # has it dlopen-mapped — replace swaps the inode and leaves the old
    # mapping intact.
    tmp = _LIB_PATH + ".tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp] + sources
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        return False


def _stale() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(os.path.join(_SRC, f)) > lib_mtime
        for f in os.listdir(_SRC)
        if f.endswith(".cpp")
    )


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if _stale() and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.smooth_mesh.argtypes = [
            f64p, ctypes.c_int64, i64p, i64p, i64p, i64p, i64p, i64p,
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.smooth_mesh.restype = None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.smooth_mesh_cells.argtypes = [
            f64p, ctypes.c_int64, i64p, ctypes.c_int64, u8p, ctypes.c_int64,
        ]
        lib.smooth_mesh_cells.restype = None
        lib.delaunay_triangulate.argtypes = [f64p, ctypes.c_int64, i64p, ctypes.c_int64]
        lib.delaunay_triangulate.restype = ctypes.c_int64
        lib.polyline_min_dist.argtypes = [
            f64p, ctypes.c_int64, f64p, ctypes.c_int64, f64p,
        ]
        lib.polyline_min_dist.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def smooth_native(coords, nbr_indices, nbr_offsets, opp_a, opp_b, opp_offsets,
                  interior, iters: int) -> np.ndarray:
    """In-place smoothing on a copy of coords; returns the new coords."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.ascontiguousarray(coords, dtype=np.float64).copy()
    lib.smooth_mesh(
        out, len(out),
        np.ascontiguousarray(nbr_indices, np.int64),
        np.ascontiguousarray(nbr_offsets, np.int64),
        np.ascontiguousarray(opp_a, np.int64),
        np.ascontiguousarray(opp_b, np.int64),
        np.ascontiguousarray(opp_offsets, np.int64),
        np.ascontiguousarray(interior, np.int64),
        len(interior), iters,
    )
    return out


def smooth_cells_native(coords, cells, boundary_mask, iters: int) -> np.ndarray:
    """Topology-building smoother: one native call from raw (coords, cells,
    boundary mask) — replaces the NumPy `_star_topology` prep on the env
    hot path.  Bit-identical to `smooth_native` over `_star_topology`
    (ascending neighbour order preserved; asserted in tests)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.ascontiguousarray(coords, dtype=np.float64).copy()
    lib.smooth_mesh_cells(
        out, len(out),
        np.ascontiguousarray(cells, np.int64), len(cells),
        np.ascontiguousarray(boundary_mask, np.uint8),
        iters,
    )
    return out


def polyline_distance_native(points: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Min distance from each point to the closed polyline `ring`."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    rg = np.ascontiguousarray(ring, dtype=np.float64)
    out = np.empty(len(pts), dtype=np.float64)
    lib.polyline_min_dist(pts, len(pts), rg, len(rg), out)
    return out


def delaunay_native(points: np.ndarray) -> np.ndarray:
    """Delaunay triangle list (T, 3) of a 2D point set."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    max_tris = 3 * len(pts) + 16
    out = np.empty((max_tris, 3), dtype=np.int64)
    n = lib.delaunay_triangulate(pts, len(pts), out, max_tris)
    if n < 0:
        raise RuntimeError("native Delaunay failed")
    return np.ascontiguousarray(out[:n]).astype(np.int32)
