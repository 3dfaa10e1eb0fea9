"""ctypes bindings for the native frame-IO library (native/frameio.cpp):
PNG decoding and a threaded sequence prefetcher.

The shared library is built on first use with the system toolchain (g++ -lz)
and cached next to the source; every consumer degrades gracefully to
cv2-based IO when the native path is unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libframeio.so"
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        src = _NATIVE_DIR / "frameio.cpp"
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB_PATH),
                 str(src), "-lz", "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.frameio_read_png.restype = ctypes.c_int
        lib.frameio_read_png.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.frameio_prefetcher_create.restype = ctypes.c_void_p
        lib.frameio_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.frameio_prefetcher_next.restype = ctypes.c_int
        lib.frameio_prefetcher_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.frameio_prefetcher_destroy.restype = None
        lib.frameio_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except (subprocess.CalledProcessError, OSError) as e:
        logging.warning("native frameio unavailable (%s); falling back to cv2", e)
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def _unpack(buf: np.ndarray, w: int, h: int, channels: int, bitdepth: int
            ) -> np.ndarray:
    if bitdepth == 16:
        img = buf.view(">u2").astype(np.uint16)
    else:
        img = buf
    img = img.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def read_png(path: str) -> np.ndarray:
    """Decode a PNG natively: (H, W) uint16/uint8 for gray, (H, W, C) uint8
    otherwise.  Raises on unsupported formats (caller falls back)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native frameio unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    d = ctypes.c_int()
    err = lib.frameio_read_png(path.encode(), None, w, h, c, d)
    if err != 0:
        raise ValueError(f"frameio_read_png({path}) failed: {err}")
    buf = np.empty(w.value * h.value * c.value * (d.value // 8), np.uint8)
    err = lib.frameio_read_png(path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
                               w, h, c, d)
    if err != 0:
        raise ValueError(f"frameio_read_png({path}) failed: {err}")
    return _unpack(buf, w.value, h.value, c.value, d.value)


class PngPrefetcher:
    """Sequential decode-ahead over a list of PNG paths.  Worker threads keep
    ``ring_size`` frames decoded in front of the consumer (the reference
    leans on a torch DataLoader for the training path and does nothing for
    the SLAM path, icl_nuim.py:60-68 -- decode latency lands on the hot loop
    there)."""

    def __init__(self, paths: List[str], ring_size: int = 8, n_threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frameio unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.frameio_prefetcher_create(arr, len(self._paths),
                                                     ring_size, n_threads)
        self._n = len(paths)
        self._consumed = 0
        # dimensions probed from the first frame for buffer sizing
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        d = ctypes.c_int()
        err = lib.frameio_read_png(self._paths[0], None, w, h, c, d)
        if err != 0:
            raise ValueError(f"cannot probe {paths[0]}: {err}")
        self._shape = (w.value, h.value, c.value, d.value)

    def __len__(self):
        return self._n

    def next(self) -> np.ndarray:
        w0, h0, c0, d0 = self._shape
        buf = np.empty(w0 * h0 * c0 * (d0 // 8), np.uint8)
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        d = ctypes.c_int()
        err = self._lib.frameio_prefetcher_next(
            self._handle, buf.ctypes.data_as(ctypes.c_void_p), w, h, c, d)
        if err != 0:
            raise ValueError(f"prefetcher_next failed: {err}")
        self._consumed += 1
        return _unpack(buf, w.value, h.value, c.value, d.value)

    def close(self):
        if self._handle:
            self._lib.frameio_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
