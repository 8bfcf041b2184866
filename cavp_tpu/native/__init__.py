"""ctypes bindings for the native host-IO core (libdataio.so).

Builds on first use (``make`` in this directory) and degrades
gracefully: ``available()`` returns False when the toolchain or image
libraries are missing, and callers fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdataio.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-s", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.decode_image_file.restype = ctypes.c_int
    lib.decode_image_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.decode_mask_file.restype = ctypes.c_int
    lib.decode_mask_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    lib.decode_image_batch.restype = ctypes.c_int
    lib.decode_image_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int]
    lib.decode_mask_batch.restype = ctypes.c_int
    lib.decode_mask_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    if hasattr(lib, "decode_raw"):  # older cached .so builds lack it
        lib.decode_raw.restype = ctypes.c_int
        lib.decode_raw.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_image(path: str, height: int, width: int, mean, std) -> np.ndarray:
    """Decode + PIL-parity bicubic resize + normalize -> [H, W, 3] f32."""
    lib = _load()
    assert lib is not None
    out = np.empty((height, width, 3), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    rc = lib.decode_image_file(path.encode(), height, width, _fptr(m),
                               _fptr(s), _fptr(out))
    if rc != 0:
        raise IOError(f"native decode failed for {path}")
    return out


def decode_mask(path: str, height: int, width: int) -> np.ndarray:
    """Decode palette/gray mask + nearest resize -> [H, W] int32."""
    lib = _load()
    assert lib is not None
    out = np.empty((height, width), np.int32)
    rc = lib.decode_mask_file(
        path.encode(), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise IOError(f"native decode failed for {path}")
    return out


def has_decode_raw() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "decode_raw")


def decode_raw(path: str, as_gray: bool = False,
               initial_cap: int = 2048 * 2048 * 3) -> np.ndarray:
    """Raw decode -> uint8 [H, W, C] at source dims (C=3 RGB, or C=1
    gray/palette-index for ``as_gray``). The train-path entry: decode in
    C++ (GIL-free), augment in Python."""
    lib = _load()
    assert lib is not None and hasattr(lib, "decode_raw")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    buf = np.empty((initial_cap,), np.uint8)
    p8 = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rc = lib.decode_raw(path.encode(), int(as_gray), p8, initial_cap,
                        ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc == 2:  # oversized source: exact-size retry
        need = h.value * w.value * c.value
        buf = np.empty((need,), np.uint8)
        p8 = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        rc = lib.decode_raw(path.encode(), int(as_gray), p8, need,
                            ctypes.byref(h), ctypes.byref(w),
                            ctypes.byref(c))
    if rc != 0:
        raise IOError(f"native raw decode failed for {path}")
    n = h.value * w.value * c.value
    return buf[:n].reshape(h.value, w.value, c.value).copy()


def decode_image_batch(paths: Sequence[str], height: int, width: int,
                       mean, std, n_threads: int = 8) -> np.ndarray:
    lib = _load()
    assert lib is not None
    n = len(paths)
    out = np.empty((n, height, width, 3), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.decode_image_batch(arr, n, height, width, _fptr(m), _fptr(s),
                                _fptr(out), n_threads)
    if rc != 0:
        raise IOError("native batch decode failed")
    return out


def decode_mask_batch(paths: Sequence[str], height: int, width: int,
                      n_threads: int = 8) -> np.ndarray:
    lib = _load()
    assert lib is not None
    n = len(paths)
    out = np.empty((n, height, width), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.decode_mask_batch(
        arr, n, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    if rc != 0:
        raise IOError("native mask batch decode failed")
    return out
