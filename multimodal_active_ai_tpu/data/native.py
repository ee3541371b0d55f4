"""ctypes bindings to the native C++ data runtime.

The role of DALI's C++ executor in the reference (SURVEY §2.3) is played
here by ``runtime/libmaai_runtime.so`` — a libjpeg-based threaded decoder
with DCT-domain prescaling (see ``runtime/loader.cc``). The library is
built lazily with ``make`` on first use; when unavailable the
:class:`~multimodal_active_ai_tpu.data.loader.HostLoader` falls back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libmaai_runtime.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.maai_decode_resize.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_uint8)]
    lib.maai_decode_resize.restype = ctypes.c_int
    lib.maai_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.maai_decode_batch.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_resize(path: str, canvas: int) -> np.ndarray | None:
    """Decode one JPEG to an RGB uint8 canvas; None on failure (caller falls
    back to PIL — e.g. for PNGs)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((canvas, canvas, 3), np.uint8)
    rc = lib.maai_decode_resize(
        path.encode(), canvas, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode_batch(paths: list[str], canvas: int, out: np.ndarray,
                 num_threads: int = 0) -> np.ndarray:
    """Threaded batch decode into a preallocated (N, canvas, canvas, 3) u8
    array. Returns a bool array marking successes."""
    lib = _load()
    n = len(paths)
    assert out.shape == (n, canvas, canvas, 3) and out.dtype == np.uint8
    if lib is None:
        return np.zeros((n,), bool)
    if num_threads <= 0:
        num_threads = min(max(os.cpu_count() or 1, 1), 16)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = np.zeros((n,), np.int32)
    lib.maai_decode_batch(arr, n, canvas,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                          num_threads)
    return ok.astype(bool)
