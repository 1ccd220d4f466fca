"""ctypes front-end + ABIN writer for the native batch loader."""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_SRC = Path(__file__).parent / "amuse_io.cc"
_LIB = Path(__file__).parent / "libamuse_io.so"
_DTYPES = {0: np.float32, 1: np.int32}
_DTYPE_IDS = {np.dtype(np.float32): 0, np.dtype(np.int32): 1}


def build(force: bool = False) -> Optional[Path]:
    """Compile libamuse_io.so with g++ (one-time, ~1 s; rebuilt when the
    source is newer than the cached .so)."""
    if (
        _LIB.exists()
        and not force
        and _LIB.stat().st_mtime >= _SRC.stat().st_mtime
    ):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True,
        )
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def is_available() -> bool:
    return build() is not None


def write_abin(path, records: dict[str, np.ndarray]) -> Path:
    """{name: (N, ...) array} -> one ABIN file (f32/i32 fields only)."""
    path = Path(path)
    names = list(records)
    n = records[names[0]].shape[0]
    arrays = {}
    for k in names:
        a = np.ascontiguousarray(records[k])
        if a.dtype not in _DTYPE_IDS:
            a = a.astype(np.float32 if np.issubdtype(a.dtype, np.floating) else np.int32)
        assert a.shape[0] == n, f"field {k} has {a.shape[0]} records, expected {n}"
        arrays[k] = a

    # write to a temp file + atomic rename: an interrupted write must never
    # leave a truncated train.abin behind - the mtime-gated reuse in
    # task_train_gesture would silently feed garbage batches forever
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(b"ABIN")
        f.write(struct.pack("<IQ I", 1, n, len(names)))
        for k in names:
            a = arrays[k]
            kb = k.encode()
            f.write(struct.pack("<I", len(kb)))
            f.write(kb)
            f.write(struct.pack("<II", _DTYPE_IDS[a.dtype], a.ndim - 1))
            for d in a.shape[1:]:
                f.write(struct.pack("<Q", d))
        for i in range(n):
            for k in names:
                f.write(arrays[k][i].tobytes())
        f.flush()
        os.fsync(f.fileno())
    tmp.rename(path)
    return path


class NativeWindowLoader:
    """Shuffled, prefetched epoch iterator over an ABIN cache file."""

    def __init__(self, path):
        lib_path = build()
        if lib_path is None:
            raise RuntimeError("g++ unavailable; use the Python WindowCache")
        self._lib = ctypes.CDLL(str(lib_path))
        L = self._lib
        L.amuse_open.restype = ctypes.c_void_p
        L.amuse_open.argtypes = [ctypes.c_char_p]
        L.amuse_num_records.restype = ctypes.c_uint64
        L.amuse_num_records.argtypes = [ctypes.c_void_p]
        L.amuse_num_fields.restype = ctypes.c_uint32
        L.amuse_num_fields.argtypes = [ctypes.c_void_p]
        L.amuse_field_name.restype = ctypes.c_char_p
        L.amuse_field_name.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        L.amuse_field_dtype.restype = ctypes.c_uint32
        L.amuse_field_dtype.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        L.amuse_field_ndim.restype = ctypes.c_uint32
        L.amuse_field_ndim.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        L.amuse_field_dim.restype = ctypes.c_uint64
        L.amuse_field_dim.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32]
        L.amuse_start_epoch.restype = ctypes.c_uint64
        L.amuse_start_epoch.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint32,
        ]
        L.amuse_next_batch.restype = ctypes.c_int
        L.amuse_next_batch.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        L.amuse_batch_bytes.restype = ctypes.c_uint64
        L.amuse_batch_bytes.argtypes = [ctypes.c_void_p]
        L.amuse_close.argtypes = [ctypes.c_void_p]

        self._h = L.amuse_open(str(path).encode())
        if not self._h:
            raise FileNotFoundError(f"cannot open ABIN cache: {path}")
        self.num_records = L.amuse_num_records(self._h)
        self.fields = []
        for i in range(L.amuse_num_fields(self._h)):
            name = L.amuse_field_name(self._h, i).decode()
            dtype = _DTYPES[L.amuse_field_dtype(self._h, i)]
            shape = tuple(
                L.amuse_field_dim(self._h, i, d)
                for d in range(L.amuse_field_ndim(self._h, i))
            )
            self.fields.append((name, dtype, shape))

    def __len__(self):
        return int(self.num_records)

    def epoch(self, batch_size: int, seed: int = 0, shuffle: bool = True, prefetch: int = 3):
        """Yield {name: (B, ...) array} batches, assembled off-thread."""
        n_batches = self._lib.amuse_start_epoch(
            self._h, batch_size, seed, int(shuffle), prefetch
        )
        nbytes = self._lib.amuse_batch_bytes(self._h)
        buf = ctypes.create_string_buffer(nbytes)
        for _ in range(n_batches):
            ok = self._lib.amuse_next_batch(self._h, buf)
            if not ok:
                return
            raw = np.frombuffer(buf, dtype=np.uint8)
            out, off = {}, 0
            for name, dtype, shape in self.fields:
                size = batch_size * int(np.prod(shape, dtype=np.int64)) * 4
                arr = raw[off : off + size].view(dtype).reshape((batch_size,) + shape)
                out[name] = arr.copy()  # detach from the reused buffer
                off += size
            yield out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.amuse_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def cache_to_abin(cache_dir, out_path, fields: Optional[Sequence[str]] = None) -> Path:
    """Convert a sharded WindowCache into one ABIN file.

    ``fields`` selects a subset (the gesture train loop drops the 640 KB
    raw-audio column - it only needs motion + conditioning + labels).
    """
    from amuse_tpu.data.cache import FIELDS, WindowCache

    fields = list(fields) if fields else list(FIELDS)
    wc = WindowCache(cache_dir)
    records = {f: [] for f in fields}
    for i in range(len(wc)):
        item = wc[i]
        for f in fields:
            records[f].append(item[f])
    stacked = {f: np.stack(records[f]) for f in fields}
    for k in ("actor_id", "emo_label"):
        if k in stacked:
            stacked[k] = stacked[k].astype(np.int32)
    return write_abin(out_path, stacked)
