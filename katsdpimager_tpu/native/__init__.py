"""Native (C++) host-side components, loaded via ctypes.

The shared library is built on demand with g++ (OpenMP, -O3) and cached
next to the sources; no pybind11 or build-system dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libktpu_native.so")
_SRC = os.path.join(_HERE, "preprocess.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class ChannelConfigStruct(ctypes.Structure):
    _fields_ = [
        ("cell_size", ctypes.c_double),
        ("max_w", ctypes.c_double),
        ("oversample", ctypes.c_int32),
        ("w_slices", ctypes.c_int32),
        ("w_planes", ctypes.c_int32),
        ("pixels", ctypes.c_int32),
        ("kernel_width", ctypes.c_int32),
    ]


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if necessary) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ktpu_preprocess_channel.restype = ctypes.c_int64
        lib.ktpu_preprocess_channel.argtypes = [
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),   # uvw
            ctypes.POINTER(ctypes.c_float),   # weights
            ctypes.POINTER(ctypes.c_float),   # vis
            ctypes.POINTER(ctypes.c_float),   # mueller
            ctypes.c_int32,                   # per_vis_mueller
            ctypes.POINTER(ChannelConfigStruct),
            ctypes.POINTER(ctypes.c_int16),   # out_uv
            ctypes.POINTER(ctypes.c_int16),   # out_sub_uv
            ctypes.POINTER(ctypes.c_int16),   # out_w_plane
            ctypes.POINTER(ctypes.c_float),   # out_weights
            ctypes.POINTER(ctypes.c_float),   # out_vis
            ctypes.POINTER(ctypes.c_int64),   # out_slice_counts
        ]
        lib.ktpu_num_threads.restype = ctypes.c_int32
        _lib = lib
        return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i16ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def preprocess_channel(uvw, weights, vis, mueller, geometry):
    """Run the native preprocessing for one channel.

    uvw (n,3) f32; weights/vis (n,Q); mueller (P,Q) or (n,P,Q) complex64;
    geometry: a :class:`..preprocess.ChannelGeometry`.

    Returns a dict matching the JAX path's per-channel output (trimmed to
    the merged count, sorted by (w_slice, v, u, sub, w_plane)).
    """
    lib = load()
    uvw = np.ascontiguousarray(uvw, np.float32)
    weights = np.ascontiguousarray(weights, np.float32)
    vis = np.ascontiguousarray(vis, np.complex64)
    mueller = np.ascontiguousarray(mueller, np.complex64)
    n = uvw.shape[0]
    Q = weights.shape[-1]
    per_vis = 1 if mueller.ndim == 3 else 0
    P = mueller.shape[-2]

    cfg = ChannelConfigStruct(
        cell_size=geometry.cell_size, max_w=geometry.max_w,
        oversample=geometry.oversample, w_slices=geometry.w_slices,
        w_planes=geometry.w_planes, pixels=geometry.pixels,
        kernel_width=geometry.kernel_width)

    out_uv = np.empty((n, 2), np.int16)
    out_sub = np.empty((n, 2), np.int16)
    out_wp = np.empty((n,), np.int16)
    out_wt = np.empty((n, P), np.float32)
    out_vis = np.empty((n, P), np.complex64)
    counts = np.zeros((geometry.w_slices,), np.int64)

    m = lib.ktpu_preprocess_channel(
        n, Q, P, _fptr(uvw), _fptr(weights),
        vis.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mueller.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        per_vis, ctypes.byref(cfg),
        _i16ptr(out_uv), _i16ptr(out_sub), _i16ptr(out_wp),
        _fptr(out_wt),
        out_vis.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if m < 0:
        raise RuntimeError("native preprocessing failed")
    # Reconstruct w_slice per record from the counts (records are sorted).
    ws = np.repeat(np.arange(geometry.w_slices, dtype=np.int16), counts)
    return {
        "uv": out_uv[:m], "sub_uv": out_sub[:m], "w_plane": out_wp[:m],
        "w_slice": ws, "weights": out_wt[:m], "vis": out_vis[:m],
        "count": int(m), "slice_counts": counts.astype(np.int32),
    }
