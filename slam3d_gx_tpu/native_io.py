"""ctypes bindings for the native runtime (native/*.cc).

The C++ layer provides the host-side data path: PNG decode (rgb/depth
dataset contract), PCD codec, and a threaded prefetching loader that
overlaps file decode with device compute. Falls back gracefully: if the
shared library isn't built (or the toolchain is unavailable),
`available()` is False and callers use the pure-Python io modules.

Build: `make -C native` (done lazily on first use when a compiler
exists).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "build", "libslam3d_native.so")
_lock = threading.Lock()
_lib = None
_tried = False

MODE_GRAY8 = 0
MODE_DEPTH16 = 1
MODE_PCD = 2


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", os.path.join(_ROOT, "native")],
            capture_output=True, text=True, timeout=120,
        )
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.slam3d_png_info.restype = ctypes.c_int
        lib.slam3d_png_decode.restype = ctypes.c_int
        lib.slam3d_pcd_points.restype = ctypes.c_int64
        lib.slam3d_pcd_read.restype = ctypes.c_int64
        lib.slam3d_loader_create.restype = ctypes.c_void_p
        lib.slam3d_loader_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.slam3d_loader_next.restype = ctypes.c_int64
        lib.slam3d_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.slam3d_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def png_decode(path: str, to_gray: bool = True) -> np.ndarray:
    """Decode a PNG file. Returns u8 (H,W) / (H,W,C) or u16 (H,W)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    data = np.fromfile(path, dtype=np.uint8)
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    ch = ctypes.c_uint32()
    bd = ctypes.c_uint32()
    rc = lib.slam3d_png_info(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(data.size),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch), ctypes.byref(bd))
    if rc != 0:
        raise ValueError(f"bad png: {path}")
    H, W, C, B = h.value, w.value, ch.value, bd.value
    if B == 16:
        out = np.empty((H, W * C), np.uint16)
    elif to_gray and C >= 3:
        out = np.empty((H, W), np.uint8)
    else:
        out = np.empty((H, W * C), np.uint8)
    rc = lib.slam3d_png_decode(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(data.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(1 if (to_gray and C >= 3 and B == 8) else 0))
    if rc != 0:
        raise ValueError(f"png decode failed ({rc}): {path}")
    if B == 16 or (to_gray and C >= 3):
        return out.reshape(H, W) if C == 1 or to_gray else out.reshape(H, W, C)
    return out.reshape(H, W) if C == 1 else out.reshape(H, W, C)


def pcd_read(path: str):
    """Read a PCD file -> (xyz float32 (N,3), rgba uint32 (N,))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    data = np.fromfile(path, dtype=np.uint8)
    ptr = data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.slam3d_pcd_points(ptr, ctypes.c_int64(data.size))
    if n < 0:
        raise ValueError(f"bad pcd: {path}")
    xyz = np.empty((n, 3), np.float32)
    rgba = np.empty((n,), np.uint32)
    rc = lib.slam3d_pcd_read(
        ptr, ctypes.c_int64(data.size),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    if rc != n:
        raise ValueError(f"pcd read failed ({rc}): {path}")
    return xyz, rgba


class PrefetchLoader:
    """In-order threaded prefetch over a list of files of one kind.

    mode: MODE_GRAY8 (u8 HxW), MODE_DEPTH16 (u16 HxW), MODE_PCD
    (float32 (N,3) + uint32 (N,)). Iterate with next(); None payload on
    per-item decode failure.
    """

    def __init__(self, paths: List[str], mode: int, height: int = 0,
                 width: int = 0, max_points: int = 1 << 19,
                 queue_depth: int = 4, threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.mode = mode
        self.h, self.w = height, width
        self.max_points = max_points
        if mode == MODE_PCD:
            self.item_bytes = max_points * 16
        elif mode == MODE_DEPTH16:
            self.item_bytes = height * width * 2
        else:
            self.item_bytes = height * width
        blob = b"\0".join(p.encode() for p in paths) + b"\0"
        self._n = len(paths)
        self._consumed = 0
        self._buf = np.empty((self.item_bytes,), np.uint8)
        self._handle = lib.slam3d_loader_create(
            blob, len(blob), len(paths), mode, self.item_bytes,
            queue_depth, threads, width, height)

    def next(self):
        """Returns the decoded item, None on decode failure, raises
        StopIteration at end of stream."""
        if self._consumed >= self._n:
            raise StopIteration
        payload = self._lib.slam3d_loader_next(
            self._handle, self._buf.ctypes.data_as(ctypes.c_void_p))
        self._consumed += 1
        if payload == -1:
            raise StopIteration
        if payload < 0:
            return None
        if self.mode == MODE_PCD:
            n = int(payload)
            xyz = self._buf[: n * 12].view(np.float32).reshape(n, 3).copy()
            rgba = self._buf[n * 12: n * 16].view(np.uint32).copy()
            return xyz, rgba
        if self.mode == MODE_DEPTH16:
            return self._buf[: self.h * self.w * 2].view(np.uint16).reshape(
                self.h, self.w).copy()
        return self._buf[: self.h * self.w].reshape(self.h, self.w).copy()

    def close(self):
        if self._handle:
            self._lib.slam3d_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
