"""Native (C++) host-side kernels, built on demand and loaded via ctypes.

The device compute path is JAX/XLA/Pallas; this package accelerates the
*host* runtime around it (mesh adjacency hashing, batched point location —
see ``meshkit.cpp``).  Everything here is optional: if no C++ toolchain is
available, callers silently use the pure-numpy fallbacks.

Reference parity note: the reference ships one native file,
``sem/bary_interp.c`` (barycentric interpolation, never built into an
extension); ``meshkit.cpp`` subsumes it (same barycentric node-hit
semantics inside the Newton point locator).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "meshkit.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_lib() -> str | None:
    """Compile meshkit.cpp to a shared library (cached by source mtime)."""
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_HERE, "_meshkit" + suffix)
    try:
        if (os.path.exists(out)
                and os.path.getmtime(out) >= os.path.getmtime(_SRC)):
            return out
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", out + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build_lib()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None

        i64 = ctypes.c_int64
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.semn_match_keys.restype = i64
        lib.semn_match_keys.argtypes = [p_i64, i64, p_i64]
        lib.semn_lookup_keys.restype = None
        lib.semn_lookup_keys.argtypes = [p_i64, i64, p_i64, i64, p_i64]
        lib.semn_locate_points.restype = None
        lib.semn_locate_points.argtypes = [
            p_f64, i64,                    # centroids, E
            p_f64, p_f64,                  # x_coeffs, j_coeffs
            ctypes.c_int, ctypes.c_int,    # n0, n1
            p_f64, p_f64, p_f64, p_f64,    # nodes0, w0, nodes1, w1
            p_f64, i64,                    # points, Q
            ctypes.c_double, ctypes.c_double, i64,
            p_i64, p_f64,                  # elem, xi
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    """True when the native library is (or can be) built and loaded."""
    return _load() is not None


def match_keys(keys: np.ndarray) -> np.ndarray:
    """partner[i] = j with keys[j] == keys[i] (exactly-paired), else -1.

    Raises ValueError if any key occurs more than twice.  Native
    replacement for the sort-based matcher in ``Mesh.find_neighbors``.
    """
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    partner = np.empty_like(keys)
    rc = lib.semn_match_keys(keys, keys.size, partner)
    if rc:
        raise ValueError(
            f"key {keys[rc - 1]} occurs more than twice "
            f"(a face shared by more than 2 cells)"
        )
    return partner


def lookup_keys(keys: np.ndarray, query: np.ndarray) -> np.ndarray:
    """For each query key, index of a matching entry in ``keys`` or -1."""
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    query = np.ascontiguousarray(query, dtype=np.int64)
    out = np.empty(query.size, dtype=np.int64)
    lib.semn_lookup_keys(keys, keys.size, query, query.size, out)
    return out


def locate_points(centroids, x_coeffs, j_coeffs, nodes0, w0, nodes1, w1,
                  points, bound_tol: float = 1e-7,
                  extrapolate_tol: float = 0.0,
                  max_candidates: int = 16):
    """Batched 2D point location (bin-grid search + Newton inverse map).

    Returns (elem (Q,) int64 with -1 = not found, xi (Q, 2) float64).
    Parity: ``sem/mapping.py:146-178`` (it_max=8, tol=1e-8) +
    ``sem/discrete.py:263-280`` (centroid-distance candidate order).
    """
    lib = _load()
    centroids = np.ascontiguousarray(centroids, dtype=np.float64)
    x_coeffs = np.ascontiguousarray(x_coeffs, dtype=np.float64)
    j_coeffs = np.ascontiguousarray(j_coeffs, dtype=np.float64)
    points = np.ascontiguousarray(points, dtype=np.float64)
    E = centroids.shape[0]
    Q = points.shape[0]
    n0, n1 = x_coeffs.shape[-2], x_coeffs.shape[-1]
    elem = np.empty(Q, dtype=np.int64)
    xi = np.empty((Q, 2), dtype=np.float64)
    lib.semn_locate_points(
        centroids, E, x_coeffs, j_coeffs, n0, n1,
        np.ascontiguousarray(nodes0, dtype=np.float64),
        np.ascontiguousarray(w0, dtype=np.float64),
        np.ascontiguousarray(nodes1, dtype=np.float64),
        np.ascontiguousarray(w1, dtype=np.float64),
        points, Q, bound_tol, extrapolate_tol, max_candidates, elem, xi,
    )
    return elem, xi
