"""ctypes binding for the native JPEG decode+resize library
(imageclassification_tpu/native/decode.cpp).

Built lazily with g++ on first use (cached next to the source); every decode
call releases the GIL (ctypes), so the DeviceLoader's ThreadPoolExecutor gets
true multicore decode without the reference's worker-process DataLoader
(train.py:152-159). Falls back silently to the PIL path when the toolchain or
libjpeg is unavailable (loader.decode_image handles that case).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "decode.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "libimgdecode.so")

BILINEAR = 1
BICUBIC = 2


def _build() -> bool:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", so, "-ljpeg"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # missing toolchain/libjpeg → PIL fallback
        print(f"native decoder build failed ({e}); using PIL decode")
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable.

    `_tried` is only set AFTER the load resolves (inside the lock): a
    concurrent first-use from the loader's thread pool must block on the
    lock, not observe a half-initialized state and silently fall back to
    PIL (which decodes slightly differently → nondeterministic batches)."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:  # resolved to 'unavailable'
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        if not _build():
            _tried = True
            return None
        lib = ctypes.CDLL(os.path.abspath(_SO))
        lib.jpeg_dims.restype = ctypes.c_int
        lib.jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.decode_crop_resize.restype = ctypes.c_int
        lib.decode_crop_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def jpeg_dims(data: bytes):
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.jpeg_dims(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def decode_crop_resize(
    data: bytes, crop, out_size: int, filter: int = BICUBIC
) -> np.ndarray | None:
    """crop = (x, y, w, h) in original coordinates (w/h = -1 → full image);
    returns uint8 [out, out, 3] or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, 3), np.uint8)
    cx, cy, cw, ch = crop
    rc = lib.decode_crop_resize(
        data, len(data), cx, cy, cw, ch, out_size, filter,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out if rc == 0 else None
