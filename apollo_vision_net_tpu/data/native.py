"""ctypes bindings for the native host-ops library (csrc/host_ops.cpp).

Auto-builds with make on first use; every entry point has a numpy fallback
(data/pipeline.py), so the library is an accelerator, not a dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libhost_ops.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.resize_normalize_pad.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.voxelize_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_normalize_pad(
    imgs_u8: np.ndarray,  # (N, H, W, 3) uint8 RGB
    scale: float,
    mean: np.ndarray,
    std: np.ndarray,
    size_divisor: int = 32,
) -> Optional[np.ndarray]:
    """Native fused resize+normalize+pad; None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    imgs_u8 = np.ascontiguousarray(imgs_u8, np.uint8)
    n, h, w, _ = imgs_u8.shape
    nh, nw = int(round(h * scale)), int(round(w * scale))
    oh = (nh + size_divisor - 1) // size_divisor * size_divisor
    ow = (nw + size_divisor - 1) // size_divisor * size_divisor
    out = np.empty((n, oh, ow, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.resize_normalize_pad(
        imgs_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, ctypes.c_float(scale), _fptr(mean), _fptr(std),
        _fptr(out), oh, ow,
    )
    return out


def voxelize_points(
    points: np.ndarray,       # (n, 4) [x, y, z, label]
    pc_range,
    voxel_size,
    dims: Tuple[int, int, int],  # (xdim, ydim, zdim)
    num_classes: int,
    empty_label: int,
) -> Optional[np.ndarray]:
    """Majority-vote semantic voxelization → dense (z·y·x,) labels
    (x minor — the reference's convert_lidar_pcd_to_occ.py:122 layout)."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    xdim, ydim, zdim = dims
    dense = np.full((zdim * xdim * ydim,), empty_label, np.int32)
    pcr = np.ascontiguousarray(pc_range, np.float32)
    lib.voxelize_points(
        _fptr(points), points.shape[0], _fptr(pcr),
        ctypes.c_float(voxel_size[0]), ctypes.c_float(voxel_size[1]),
        ctypes.c_float(voxel_size[2]),
        xdim, ydim, zdim, num_classes,
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return dense
