"""ctypes binding for the native C++ frame loader (cpp/vos_loader.cc).

Provides libjpeg/libpng decode and a threaded prefetch pool — the TPU-native
replacement for the reference's OpenCV decode inside DataLoader worker
processes (SURVEY.md §2.4). Falls back gracefully: callers should check
``available()`` and use the PIL/cv2 path in datasets.py otherwise. The
shared library is built on demand with ``make -C cpp`` (g++ + libjpeg/libpng
are baked into the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "cpp", "libvos_loader.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO, "cpp")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.vos_decode_jpeg.restype = ctypes.c_int
    lib.vos_decode_jpeg.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vos_decode_png_indexed.restype = ctypes.c_int
    lib.vos_decode_png_indexed.argtypes = lib.vos_decode_jpeg.argtypes
    lib.vos_loader_create.restype = ctypes.c_void_p
    lib.vos_loader_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.vos_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.vos_loader_submit.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vos_loader_submit_cap.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_long,
    ]
    lib.vos_loader_wait.restype = ctypes.c_int
    lib.vos_loader_wait.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _probe(lib, path: str, kind: int) -> Tuple[int, int]:
    h = ctypes.c_int()
    w = ctypes.c_int()
    fn = lib.vos_decode_jpeg if kind == 0 else lib.vos_decode_png_indexed
    rc = fn(path.encode(), None, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"native probe failed ({rc}) for {path}")
    return h.value, w.value


def decode_jpeg(path: str) -> np.ndarray:
    """JPEG → RGB uint8 [H,W,3] via libjpeg."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w = _probe(lib, path, 0)
    out = np.empty((h, w, 3), np.uint8)
    hh = ctypes.c_int()
    ww = ctypes.c_int()
    rc = lib.vos_decode_jpeg(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(hh), ctypes.byref(ww),
    )
    if rc != 0:
        raise IOError(f"jpeg decode failed ({rc}) for {path}")
    return out


def decode_png_indexed(path: str) -> np.ndarray:
    """Indexed PNG → uint8 id map [H,W] via libpng (palette indices ARE the
    object ids, parity: vos_dataset.py:63,236-242)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w = _probe(lib, path, 1)
    out = np.empty((h, w), np.uint8)
    hh = ctypes.c_int()
    ww = ctypes.c_int()
    rc = lib.vos_decode_png_indexed(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(hh), ctypes.byref(ww),
    )
    if rc != 0:
        raise IOError(f"png decode failed ({rc}) for {path}")
    return out


class PrefetchLoader:
    """Threaded native prefetcher: submit a window of frame paths, overlap
    decode with device compute, then collect.

    Buffers are preallocated per slot at ``max_hw``; decoded frames smaller
    than the slot are returned as views of the true (h, w)."""

    def __init__(self, num_threads: int = 4, num_slots: int = 16,
                 max_hw: Tuple[int, int] = (1080, 1920)):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._handle = lib.vos_loader_create(num_threads, num_slots)
        self.num_slots = num_slots
        self._img_bufs = [
            np.empty(max_hw + (3,), np.uint8) for _ in range(num_slots)
        ]
        self._kinds: List[int] = [0] * num_slots

    def submit(self, slot: int, path: str, kind: int = 0) -> None:
        """kind: 0 = jpeg RGB, 1 = indexed png (label). The slot's buffer
        capacity bounds the decode — frames larger than the slot fail with
        an error rather than overflowing."""
        buf = self._img_bufs[slot]
        self._kinds[slot] = kind
        self._lib.vos_loader_submit_cap(
            self._handle, path.encode(),
            buf.ctypes.data_as(ctypes.c_void_p), kind, slot, buf.nbytes,
        )

    def wait(self, slot: int) -> np.ndarray:
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.vos_loader_wait(
            self._handle, slot, ctypes.byref(h), ctypes.byref(w)
        )
        if rc != 1:
            raise IOError(f"prefetch slot {slot} failed ({rc})")
        buf = self._img_bufs[slot]
        if self._kinds[slot] == 0:
            return buf[: h.value, : w.value]
        flat = buf.reshape(-1)[: h.value * w.value]
        return flat.reshape(h.value, w.value)

    def close(self):
        if self._handle:
            self._lib.vos_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
