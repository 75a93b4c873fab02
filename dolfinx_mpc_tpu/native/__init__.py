"""ctypes loader for the native C++ setup kernels (csrc/native.cpp).

The library is compiled on first import (g++, cached next to the package);
every entry point has a numpy fallback so the package works without a
toolchain.  Native code covers the reference's C++-side setup work
(SURVEY.md §2.1): entity/sparsity dedup and point-in-cell collision search.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

__all__ = ["available", "sort_unique_inverse", "locate_points", "CELL_TYPE_IDS"]

CELL_TYPE_IDS = {
    "interval": 0,
    "triangle": 1,
    "quadrilateral": 2,
    "tetrahedron": 3,
    "hexahedron": 4,
}

_lib = None


def _build_and_load():
    global _lib
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "..", "csrc", "native.cpp")
    so = os.path.join(here, "_libmpcnative.so")
    if not os.path.exists(src):
        return None
    if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", src, "-o", so]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except Exception as e:  # no toolchain / compile error -> numpy fallback
            print(f"[dolfinx_mpc_tpu.native] build failed ({e}); using numpy fallback",
                  file=sys.stderr)
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.sort_unique_inverse.restype = ctypes.c_int64
    lib.sort_unique_inverse.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.locate_points.restype = None
    lib.locate_points.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ]
    return lib


def _get():
    global _lib
    if _lib is None:
        _lib = _build_and_load() or False
    return _lib or None


_hugealloc_installed = False


def install_hugepage_allocator() -> bool:
    """Build + install the huge-page numpy allocation handler
    (csrc/hugealloc.c).  On hosts with slow 4KB demand paging (this image:
    ~40s/GB first touch) this makes every numpy allocation >= 4MB THP-backed
    (~0.6s/GB).  Idempotent; returns True if the handler is active.
    Disable with DMT_NO_HUGEPAGE_ALLOC=1."""
    global _hugealloc_installed
    if _hugealloc_installed:
        return True
    if os.environ.get("DMT_NO_HUGEPAGE_ALLOC") == "1" or sys.platform != "linux":
        return False
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "..", "..", "csrc", "hugealloc.c")
    so = os.path.join(here, "_hugealloc.so")
    if not os.path.exists(src):
        return False
    try:
        if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
            import sysconfig

            cmd = [
                "gcc", "-O2", "-shared", "-fPIC", src,
                "-I", sysconfig.get_paths()["include"],
                "-I", np.get_include(),
                "-o", so,
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        import importlib.util

        spec = importlib.util.spec_from_file_location("_hugealloc", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.install()
        _hugealloc_installed = True
        return True
    except Exception as e:  # no toolchain / unsupported kernel -> no-op
        print(f"[dolfinx_mpc_tpu.native] hugepage allocator unavailable ({e})",
              file=sys.stderr)
        return False


def available() -> bool:
    return _get() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def sort_unique_inverse(keys: np.ndarray):
    """(uniq, first_index, inverse) of an int64 key array — radix-sort native
    path, np.unique fallback."""
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    lib = _get()
    if lib is None or keys.size == 0 or keys.min() < 0:
        uniq, first, inverse = np.unique(keys, return_index=True, return_inverse=True)
        return uniq, first, inverse
    n = keys.shape[0]
    uniq = np.empty(n, np.int64)
    inverse = np.empty(n, np.int64)
    first = np.empty(n, np.int64)
    nu = lib.sort_unique_inverse(
        _ptr(keys, ctypes.c_int64), n, _ptr(uniq, ctypes.c_int64),
        _ptr(inverse, ctypes.c_int64), _ptr(first, ctypes.c_int64),
    )
    return uniq[:nu].copy(), first[:nu].copy(), inverse


def locate_points(points, cell_verts, vcoords, cell_type: str, cells=None, tol=1e-8):
    """Native grid-hash point location; returns (cells (n,), X (n, tdim)) with
    -1 for misses.  Returns None if the native library is unavailable."""
    lib = _get()
    if lib is None:
        return None
    points = np.ascontiguousarray(np.atleast_2d(points), np.float64)
    if cells is not None:
        cell_verts = cell_verts[cells]
    cell_verts = np.ascontiguousarray(cell_verts, np.int32)
    vcoords = np.ascontiguousarray(vcoords, np.float64)
    n, gdim = points.shape
    nc, nv = cell_verts.shape
    ctid = CELL_TYPE_IDS[cell_type]
    tdim = 1 if ctid == 0 else (2 if ctid <= 2 else 3)
    out_cells = np.empty(n, np.int64)
    out_X = np.zeros((n, tdim), np.float64)
    lib.locate_points(
        _ptr(points, ctypes.c_double), n, gdim,
        _ptr(cell_verts, ctypes.c_int32), nc, nv,
        _ptr(vcoords, ctypes.c_double), ctid, tol,
        _ptr(out_cells, ctypes.c_int64), _ptr(out_X, ctypes.c_double),
    )
    if cells is not None:
        hit = out_cells >= 0
        out_cells[hit] = np.asarray(cells, np.int64)[out_cells[hit]]
    return out_cells, out_X
