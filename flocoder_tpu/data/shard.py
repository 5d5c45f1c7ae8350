"""Packed latent shards + the native (C++) batch gather.

Replaces the reference's one-file-per-latent storage
(preencode_data.py:109-155: thousands of tiny torch.save files + a
ThreadPoolExecutor) with one mmap'd shard per split served by the C++
``native/fcloader.cpp`` library — per-batch cost is a lock-free multithreaded
gather instead of B file opens. A pure-numpy fallback keeps everything
working when the shared library can't be built.

Format (FCS1): ``b"FCS1" | u32 json_len | header json | i32 labels[n] |
records`` with contiguous fixed-size float32 records. The header carries
``shape`` (per-record HWC) and optional ``extra_fields`` layout for
inpainting triplets (target/source/mask packed per record).
"""
from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["ShardWriter", "ShardReader", "ShardDataset", "build_native",
           "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfcloader.so")
_lib = None


def build_native(force: bool = False) -> Optional[str]:
    """Compile native/fcloader.cpp → libfcloader.so (g++, cached)."""
    src = os.path.join(_NATIVE_DIR, "fcloader.cpp")
    if not os.path.exists(src):
        return None
    if os.path.exists(_SO_PATH) and not force and \
            os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
        return _SO_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           src, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"fcloader native build failed ({e}); using numpy fallback")
        return None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    if path is None:
        _lib = False
        return _lib
    lib = ctypes.CDLL(path)
    lib.fcs_open.restype = ctypes.c_void_p
    lib.fcs_open.argtypes = [ctypes.c_char_p]
    lib.fcs_count.restype = ctypes.c_int64
    lib.fcs_count.argtypes = [ctypes.c_void_p]
    lib.fcs_record_bytes.restype = ctypes.c_int64
    lib.fcs_record_bytes.argtypes = [ctypes.c_void_p]
    lib.fcs_gather.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int64, ctypes.c_void_p,
                               ctypes.c_void_p, ctypes.c_int]
    lib.fcs_gather_async.restype = ctypes.c_void_p
    lib.fcs_gather_async.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64, ctypes.c_void_p,
                                     ctypes.c_void_p]
    lib.fcs_wait.argtypes = [ctypes.c_void_p]
    lib.fcs_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return bool(_load_lib())


class ShardWriter:
    """Stream records into a shard file. ``shape`` is the per-record array
    shape; ``extra_fields`` maps name → shape for additional per-record
    arrays packed after the main one (e.g. inpainting source/mask)."""

    def __init__(self, path: str, shape: Sequence[int],
                 extra_fields: Optional[dict] = None):
        self.path = path
        self.shape = tuple(int(s) for s in shape)
        self.extra_fields = {k: tuple(int(x) for x in v)
                             for k, v in (extra_fields or {}).items()}
        self._labels: list = []
        self._tmp_payload = path + ".payload.tmp"
        self._f = open(self._tmp_payload, "wb")
        self._record_bytes = 4 * int(np.prod(self.shape)) + sum(
            4 * int(np.prod(s)) for s in self.extra_fields.values())

    def add(self, record: np.ndarray, label: int = 0,
            extras: Optional[dict] = None):
        rec = np.ascontiguousarray(record, dtype=np.float32)
        assert rec.shape == self.shape, (rec.shape, self.shape)
        self._f.write(rec.tobytes())
        for name, shp in self.extra_fields.items():
            arr = np.ascontiguousarray(extras[name], dtype=np.float32)
            assert arr.shape == shp, (name, arr.shape, shp)
            self._f.write(arr.tobytes())
        self._labels.append(int(label))

    def add_batch(self, records: np.ndarray, labels=None,
                  extras: Optional[dict] = None) -> int:
        """Append a whole batch in one write — the interleaved
        ``[main | extras...]`` record layout is assembled vectorized, so the
        per-record Python loop (the pre-encode host bottleneck on a 1-core
        box, docs/ROADMAP.md) collapses into one concatenate + one write.
        Returns bytes written."""
        recs = np.asarray(records, dtype=np.float32)
        B = recs.shape[0]
        assert recs.shape[1:] == self.shape, (recs.shape, self.shape)
        if self.extra_fields:
            parts = [recs.reshape(B, -1)]
            for name, shp in self.extra_fields.items():
                arr = np.asarray(extras[name], dtype=np.float32)
                assert arr.shape == (B,) + shp, (name, arr.shape, shp)
                parts.append(arr.reshape(B, -1))
            payload = np.concatenate(parts, axis=1)
        else:
            payload = np.ascontiguousarray(recs.reshape(B, -1))
        self._f.write(payload.tobytes())
        if labels is None:
            labels = np.zeros((B,), np.int32)
        self._labels.extend(np.asarray(labels, np.int64).tolist())
        return B * self._record_bytes

    def close(self) -> str:
        self._f.close()
        n = len(self._labels)
        header = json.dumps({
            "n": n, "record_bytes": self._record_bytes,
            "shape": list(self.shape), "dtype": "float32",
            "extra_fields": {k: list(v)
                             for k, v in self.extra_fields.items()},
        }).encode()
        with open(self.path, "wb") as out:
            out.write(b"FCS1")
            out.write(np.uint32(len(header)).tobytes())
            out.write(header)
            out.write(np.asarray(self._labels, np.int32).tobytes())
            with open(self._tmp_payload, "rb") as pf:
                while chunk := pf.read(1 << 22):
                    out.write(chunk)
        os.remove(self._tmp_payload)
        return self.path


class ShardReader:
    """Batch gather from a shard — native C++ when available, else numpy
    memmap."""

    def __init__(self, path: str, use_native: Optional[bool] = None):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(4)
            assert magic == b"FCS1", f"{path}: bad magic {magic!r}"
            json_len = int(np.frombuffer(f.read(4), np.uint32)[0])
            self.header = json.loads(f.read(json_len).decode())
            self._labels_off = 8 + json_len
        self.n = self.header["n"]
        self.shape = tuple(self.header["shape"])
        self.extra_fields = {k: tuple(v) for k, v in
                             self.header.get("extra_fields", {}).items()}
        self.record_bytes = self.header["record_bytes"]
        self._payload_off = self._labels_off + 4 * self.n
        self._native = None
        if use_native is None:
            use_native = native_available()
        if use_native and native_available():
            self._native = _load_lib().fcs_open(path.encode())
            if not self._native:
                self._native = None
        if self._native is None:
            self._labels = np.memmap(path, np.int32, "r",
                                     offset=self._labels_off, shape=(self.n,))
            self._payload = np.memmap(
                path, np.uint8, "r", offset=self._payload_off,
                shape=(self.n, self.record_bytes))

    @property
    def is_native(self) -> bool:
        return self._native is not None

    def gather(self, indices: np.ndarray, n_threads: int = 4
               ) -> Tuple[dict, np.ndarray]:
        """indices (B,) → ({'target': (B,)+shape, extras...}, labels (B,))."""
        idx = np.ascontiguousarray(indices, np.int64)
        B = idx.shape[0]
        raw = np.empty((B, self.record_bytes), np.uint8)
        labels = np.empty((B,), np.int32)
        if self._native is not None:
            _load_lib().fcs_gather(
                self._native, idx.ctypes.data_as(ctypes.c_void_p), B,
                raw.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p), n_threads)
        else:
            raw[:] = self._payload[idx]
            labels[:] = self._labels[idx]
        return self._split(raw), labels

    def _split(self, raw: np.ndarray) -> dict:
        B = raw.shape[0]
        flat = raw.view(np.float32).reshape(B, -1)
        main_sz = int(np.prod(self.shape))
        out = {"target": flat[:, :main_sz].reshape((B,) + self.shape)}
        off = main_sz
        for name, shp in self.extra_fields.items():
            sz = int(np.prod(shp))
            out[name] = flat[:, off:off + sz].reshape((B,) + shp)
            off += sz
        return out

    def close(self):
        if self._native is not None:
            _load_lib().fcs_close(self._native)
            self._native = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class ShardDataset:
    """Loader-compatible dataset over one shard (see datasets.Loader). For
    shards the Loader's per-item path is bypassed — batches come from one
    native gather (``get_batch``)."""

    def __init__(self, path: str, n_classes: int = 0):
        self.reader = ShardReader(path)
        self.n_classes = n_classes
        self.is_inpainting = "source_latents" in self.reader.extra_fields

    def __len__(self):
        return self.reader.n

    def get_batch(self, indices: np.ndarray) -> dict:
        fields, labels = self.reader.gather(indices)
        batch = {"target": fields["target"], "class_cond": labels}
        if "source_latents" in fields:
            batch["source"] = fields["source_latents"]
        if "mask_pixels" in fields:
            batch["mask_pixels"] = fields["mask_pixels"]
        return batch

    def get(self, i: int, rng):
        fields, labels = self.reader.gather(np.asarray([i]))
        data = {k: v[0] for k, v in fields.items()}
        if self.is_inpainting:
            data["target_latents"] = data.pop("target")
            return data, labels[0]
        return data["target"], labels[0]
