"""Data loading: native threaded prefetch loader + pure-numpy fallback.

The native loader (data/native/dataloader.cpp) keeps a bounded ring of
pre-gathered batches filled by background C++ threads, so the jitted train
step never waits on host-side shuffling/gathering. It is compiled on first
use with g++ — into a per-user cache directory keyed by a source digest,
never into the source tree, so no binary artifact ever sits (or gets
committed) next to the .cpp — and bound via ctypes, no pybind11
dependency. If g++ is unavailable the pure-numpy loader takes over with
the same iterator contract.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["NativeDataLoader", "NumpyDataLoader", "make_dataloader",
           "native_available"]

_SRC = os.path.join(os.path.dirname(__file__), "native", "dataloader.cpp")
_lib = None
_lib_error = None


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    path = os.path.join(base, "nflows_tpu")
    os.makedirs(path, exist_ok=True)
    return path


def _build_library() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"libnflowsdata_{digest}.so")
    if not os.path.exists(out):
        # compile to a process-unique temp path and rename into place so
        # concurrent processes never CDLL a half-written file (rename is
        # atomic on POSIX; loser of the race just overwrites with identical
        # bytes)
        tmp = f"{out}.{os.getpid()}.tmp"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", _SRC, "-o", tmp,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
    return out


def _load_library():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        lib = ctypes.CDLL(_build_library())
        lib.nflows_loader_create.restype = ctypes.c_void_p
        lib.nflows_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.nflows_loader_next.restype = ctypes.c_int64
        lib.nflows_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.nflows_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # toolchain missing -> numpy fallback
        _lib_error = e
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_library() is not None


class NativeDataLoader:
    """Infinite iterator of shuffled (batch[, context]) numpy arrays, fed by
    C++ prefetch threads."""

    def __init__(self, data: np.ndarray, batch_size: int,
                 context: Optional[np.ndarray] = None, seed: int = 0,
                 num_workers: int = 2, prefetch: int = 4,
                 drop_last: bool = True):
        lib = _load_library()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_lib_error}")
        self._lib = lib
        data = np.ascontiguousarray(data, dtype=np.float32)
        self.n, self.dim = data.shape
        if drop_last and batch_size > self.n:
            raise ValueError(
                f"batch_size {batch_size} > dataset size {self.n} with "
                "drop_last=True would never yield a batch"
            )
        self.batch_size = batch_size
        if context is not None:
            context = np.ascontiguousarray(context, dtype=np.float32)
            assert context.shape[0] == self.n
            self.cdim = context.shape[1]
            ctx_ptr = context.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        else:
            self.cdim = 0
            ctx_ptr = None
        self._handle = lib.nflows_loader_create(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ctx_ptr,
            self.n, self.dim, self.cdim, batch_size, seed, num_workers,
            prefetch, 1 if drop_last else 0,
        )
        if not self._handle:
            raise RuntimeError("failed to create native loader")

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        out = np.empty((self.batch_size, self.dim), dtype=np.float32)
        if self.cdim:
            ctx = np.empty((self.batch_size, self.cdim), dtype=np.float32)
            ctx_ptr = ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        else:
            ctx = None
            ctx_ptr = None
        rows = self._lib.nflows_loader_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctx_ptr,
        )
        if rows < 0:
            raise StopIteration
        if rows < self.batch_size:
            out = out[:rows]
            ctx = ctx[:rows] if ctx is not None else None
        return (out, ctx) if self.cdim else out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.nflows_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NumpyDataLoader:
    """Pure-numpy fallback with identical semantics (single-threaded)."""

    def __init__(self, data: np.ndarray, batch_size: int,
                 context: Optional[np.ndarray] = None, seed: int = 0,
                 drop_last: bool = True, **_):
        self.data = np.asarray(data, dtype=np.float32)
        self.context = (
            np.asarray(context, dtype=np.float32) if context is not None else None
        )
        if drop_last and batch_size > len(self.data):
            raise ValueError(
                f"batch_size {batch_size} > dataset size {len(self.data)} "
                "with drop_last=True would never yield a batch"
            )
        self.batch_size = batch_size
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._order = self._rng.permutation(len(self.data))
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._pos + (self.batch_size if self.drop_last else 1) > len(self.data):
            self._order = self._rng.permutation(len(self.data))
            self._pos = 0
        idx = self._order[self._pos: self._pos + self.batch_size]
        self._pos += self.batch_size
        batch = self.data[idx]
        if self.context is not None:
            return batch, self.context[idx]
        return batch

    def close(self):
        pass


def make_dataloader(data, batch_size, context=None, seed=0, num_workers=2,
                    prefetch=4, drop_last=True, prefer_native=True):
    """Native loader when the toolchain is available, numpy otherwise."""
    if prefer_native and native_available():
        return NativeDataLoader(data, batch_size, context=context, seed=seed,
                                num_workers=num_workers, prefetch=prefetch,
                                drop_last=drop_last)
    return NumpyDataLoader(data, batch_size, context=context, seed=seed,
                           drop_last=drop_last)
