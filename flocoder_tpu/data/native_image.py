"""Native (C++) image decode + resize — the host-pipeline fast path.

Wraps ``native/fcimage.cpp`` (libjpeg/libpng decode + PIL-compatible
triangle resample, threaded batch API) behind ctypes. The reference pays
this cost in torch DataLoader worker processes (reference: data.py:477-478);
on this framework's thread-pool Loader the per-image PIL decode was the
remaining host bottleneck for the pre-encode pass (docs/ROADMAP.md) — the
native path hands Python a finished (S, S, 3) uint8 batch instead.

Every entry point degrades gracefully: if g++/libjpeg/libpng are absent the
module reports ``available() == False`` and callers keep using PIL, and a
per-file decode failure returns a redraw signal rather than raising (same
corrupt-file tolerance as datasets.ImageFolderDataset).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

__all__ = ["available", "decode_resize", "decode_resize_batch",
           "NativeLoadResized", "build_native_image"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfcimage.so")
_lib = None


def build_native_image(force: bool = False) -> Optional[str]:
    """Compile native/fcimage.cpp → libfcimage.so (g++, cached)."""
    src = os.path.join(_NATIVE_DIR, "fcimage.cpp")
    if not os.path.exists(src):
        return None
    if os.path.exists(_SO_PATH) and not force and \
            os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
        return _SO_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           src, "-o", _SO_PATH, "-ljpeg", "-lpng"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"fcimage native build failed ({e}); using PIL fallback")
        return None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native_image()
    if path is None:
        _lib = False
        return _lib
    lib = ctypes.CDLL(path)
    lib.fci_probe.restype = ctypes.c_int
    lib.fci_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
    lib.fci_decode_resize.restype = ctypes.c_int
    lib.fci_decode_resize.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                      ctypes.c_int, ctypes.c_int]
    lib.fci_decode_resize_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load_lib())


def decode_resize(path: str, size: int) -> Optional[np.ndarray]:
    """Decode one JPEG/PNG and resample to (size, size, 3) uint8. Returns
    None on decode failure (caller redraws, matching ImageFolderDataset's
    corrupt-file tolerance)."""
    lib = _load_lib()
    if not lib:
        return None
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.fci_decode_resize(os.fspath(path).encode(),
                               out.ctypes.data_as(ctypes.c_void_p),
                               size, size)
    return out if rc == 0 else None


def decode_resize_batch(paths: Sequence[str], size: int,
                        n_threads: int = 8) -> tuple:
    """Threaded batch decode → ((B, size, size, 3) uint8, ok mask (B,))."""
    lib = _load_lib()
    if not lib:
        raise RuntimeError("native image library unavailable")
    enc = [os.fspath(p).encode() + b"\0" for p in paths]
    offsets = np.zeros(len(enc), np.int64)
    pos = 0
    for i, e in enumerate(enc):
        offsets[i] = pos
        pos += len(e)
    packed = b"".join(enc)
    n = len(enc)
    out = np.empty((n, size, size, 3), np.uint8)
    status = np.empty((n,), np.int32)
    lib.fci_decode_resize_batch(
        packed, offsets.ctypes.data_as(ctypes.c_void_p), n,
        out.ctypes.data_as(ctypes.c_void_p), size, size, int(n_threads),
        status.ctypes.data_as(ctypes.c_void_p))
    return out, status == 0


class NativeLoadResized:
    """Path-based replacement for ``device_augs.load_resized``: decode +
    single resize to ``src_size`` entirely in C++, returning float32
    (S, S, 3) in [0, 1]. Exposes ``wants_path = True`` so datasets skip the
    PIL decode and hand over the file path (datasets.ImageFolderDataset).
    Falls back to PIL per file when the native decode rejects a format
    (e.g. webp)."""

    wants_path = True

    def __init__(self, src_size: int):
        self.src_size = int(src_size)

    def __call__(self, path, rng=None) -> np.ndarray:
        if not isinstance(path, (str, os.PathLike)):
            # datasets without file paths (synthetic/torchvision adapters)
            # hand a PIL image — keep the host resize for those
            from .device_augs import load_resized
            return load_resized(path, self.src_size)
        arr = decode_resize(path, self.src_size)
        if arr is None:
            from PIL import Image
            from .device_augs import load_resized
            return load_resized(Image.open(path).convert("RGB"),
                                self.src_size)
        return arr.astype(np.float32) / 255.0
