"""Monotonic alignment search — C++/OpenMP kernel with numpy fallback.

Replaces the reference's Cython module (matcha/utils/monotonic_align/,
SURVEY §2.12 item 1).  The native library is compiled on first use from
native/monotonic_align.cpp; if the toolchain is unavailable the pure-numpy
implementation (identical DP) is used."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger("hydravox.mas")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "monotonic_align.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libmonotonic_align.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.maximum_path_c.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        logger.info("loaded native monotonic_align kernel")
    except Exception as e:  # toolchain missing -> numpy fallback
        logger.warning("native monotonic_align unavailable (%s); using numpy", e)
    return _lib


def _maximum_path_numpy(value: np.ndarray, t_x: int, t_y: int) -> np.ndarray:
    """Single-item DP, identical to core.pyx:11-36. value is mutated."""
    max_neg = -1e9
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            v_cur = max_neg if x == y else value[x, y - 1]
            if x == 0:
                v_prev = 0.0 if y == 0 else max_neg
            else:
                v_prev = value[x - 1, y - 1]
            value[x, y] += max(v_cur, v_prev)
    path = np.zeros_like(value, dtype=np.int32)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (index == y or value[index, y - 1] < value[index - 1, y - 1]):
            index -= 1
    return path


def maximum_path(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Batched MAS. value/mask: (B, t_x, t_y); returns 0/1 path (B, t_x, t_y)
    (matcha/utils/monotonic_align/__init__.py:7-22)."""
    value = (np.asarray(value, np.float32) * mask).copy()
    mask = np.asarray(mask)
    b, max_t_x, max_t_y = value.shape
    t_xs = mask.sum(1)[:, 0].astype(np.int32)
    t_ys = mask.sum(2)[:, 0].astype(np.int32)

    lib = _load_native()
    if lib is not None:
        paths = np.zeros((b, max_t_x, max_t_y), np.int32)
        value_c = np.ascontiguousarray(value)
        paths_c = np.ascontiguousarray(paths)
        t_xs_c = np.ascontiguousarray(t_xs)
        t_ys_c = np.ascontiguousarray(t_ys)
        lib.maximum_path_c(
            paths_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            value_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t_xs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            t_ys_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            b, max_t_x, max_t_y,
        )
        return paths_c

    return np.stack(
        [_maximum_path_numpy(value[i], int(t_xs[i]), int(t_ys[i])) for i in range(b)]
    )


def generate_path(durations: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Durations -> alignment path (matcha/utils/model.py generate_path).
    durations: (B, t_x); mask: (B, t_x, t_y). Returns (B, t_x, t_y)."""
    b, t_x, t_y = mask.shape
    cum = np.cumsum(durations, axis=1)
    path = np.zeros((b, t_x, t_y), np.float32)
    frame = np.arange(t_y)
    for i in range(b):
        prev = 0.0
        for x in range(t_x):
            cur = cum[i, x]
            path[i, x] = (frame >= prev) & (frame < cur)
            prev = cur
    return path * mask
