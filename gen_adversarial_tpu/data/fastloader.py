"""ctypes bindings for the native C++ image pipeline (native/fastloader.cpp):
threaded JPEG/PNG decode + bilinear resize + [0,1] float32 NHWC assembly.

Builds the shared library on first use (g++, system libjpeg/libpng) and
falls back to the PIL path in datasets.py when unavailable.
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "build" / "libfastloader.so"
_lib = None
_unavailable = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
        return _SO.exists()
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _unavailable
    if _lib is not None or _unavailable:
        return _lib
    if not _SO.exists() and not _build():
        _unavailable = True
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.fl_decode_resize.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.fl_decode_resize.restype = ctypes.c_int
    lib.fl_decode_batch.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.fl_decode_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_batch(paths, out_h: int, out_w: int, n_threads: int = 8) -> np.ndarray:
    """Decode+resize a list of image paths into a (N, H, W, 3) float32 batch
    in [0,1] using the native thread pool."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastloader unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    ok = lib.fl_decode_batch(arr, n, out_h, out_w,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             n_threads)
    if ok != n:
        raise RuntimeError(f"native decode failed for {n - ok}/{n} images")
    return out
