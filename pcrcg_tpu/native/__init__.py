"""ctypes bindings for the native host kernels (native/pcrcg_native.cpp).

Compiled on first use with g++ -O3 -fopenmp (cached .so under
~/.cache/pcrcg_tpu_native).  These are the host-side counterparts of the
reference's cpp_wrappers; the TPU training path uses the on-device kernels
in pcrcg_tpu/ops — this library accelerates dataset preprocessing and
provides independent golden values for the device kernels' tests.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                    "native", "pcrcg_native.cpp")
_CACHE_DIR = os.path.expanduser("~/.cache/pcrcg_tpu_native")
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, f"pcrcg_native_{digest}.so")
    if not os.path.exists(so_path):
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
            _SRC, "-o", so_path + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except subprocess.CalledProcessError:
            cmd.remove("-fopenmp")  # openmp-less fallback
            subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so_path + ".tmp", so_path)
    return so_path


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build())
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        _lib.grid_subsample.argtypes = [f32p, ctypes.c_int, ctypes.c_float, f32p, ctypes.c_int]
        _lib.grid_subsample.restype = ctypes.c_int
        _lib.radius_neighbors.argtypes = [
            f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int, i32p,
        ]
        _lib.radius_neighbors.restype = ctypes.c_int
        _lib.radius_count.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_float, i32p]
        _lib.radius_count.restype = ctypes.c_int
    return _lib


def grid_subsample(points: np.ndarray, dl: float, cap: Optional[int] = None) -> np.ndarray:
    points = np.ascontiguousarray(points, np.float32)
    cap = cap or points.shape[0]
    out = np.empty((cap, 3), np.float32)
    n_out = lib().grid_subsample(points, points.shape[0], dl, out, cap)
    return out[:n_out]


def radius_neighbors(queries: np.ndarray, supports: np.ndarray, radius: float, k: int) -> np.ndarray:
    queries = np.ascontiguousarray(queries, np.float32)
    supports = np.ascontiguousarray(supports, np.float32)
    out = np.empty((queries.shape[0], k), np.int32)
    lib().radius_neighbors(queries, queries.shape[0], supports, supports.shape[0], radius, k, out)
    return out


def radius_count(queries: np.ndarray, supports: np.ndarray, radius: float) -> np.ndarray:
    queries = np.ascontiguousarray(queries, np.float32)
    supports = np.ascontiguousarray(supports, np.float32)
    out = np.empty(queries.shape[0], np.int32)
    lib().radius_count(queries, queries.shape[0], supports, supports.shape[0], radius, out)
    return out
