"""Python binding for the native prefetching data loader
(native/dataloader.cpp — C++ mmap + background prefetch thread).

The reference feeds inputs synchronously from disk in its example mains
(ref: example/c906_mobilenetv1_f16.c get_binary_from_file); on TPU the host
must overlap input staging with device execution, so batches are produced by
a native thread into a bounded queue while the previous batch runs.

    dl = DataLoader("samples.f32", sample_shape=(224, 224, 3), batch=8)
    for batch in dl:              # np.float32 [<=batch, *sample_shape]
        sess.run(batch)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SO = os.path.join(_NATIVE_DIR, "libdataloader.so")
_lib = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.dl_open.restype = ctypes.c_void_p
    lib.dl_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
                            ctypes.c_int, ctypes.c_uint64]
    lib.dl_n_samples.restype = ctypes.c_uint64
    lib.dl_n_samples.argtypes = [ctypes.c_void_p]
    lib.dl_next.restype = ctypes.c_uint64
    lib.dl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float)]
    lib.dl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class DataLoader:
    def __init__(self, path: str, sample_shape: Sequence[int], batch: int,
                 loop: bool = False, prefetch_depth: int = 4):
        self.sample_shape = tuple(int(d) for d in sample_shape)
        self.batch = int(batch)
        self._floats = int(np.prod(self.sample_shape))
        lib = _load_lib()
        self._lib = lib
        self._h = lib.dl_open(path.encode(), self._floats, self.batch,
                              1 if loop else 0, prefetch_depth)
        if not self._h:
            raise OSError(f"dl_open failed for {path} "
                          f"(size must be a multiple of {self._floats * 4} bytes)")
        self.n_samples = int(lib.dl_n_samples(self._h))
        self._buf = np.empty((self.batch, self._floats), np.float32)

    def next(self) -> Optional[np.ndarray]:
        """Next batch [n, *sample_shape] (n ≤ batch at EOF), or None."""
        got = self._lib.dl_next(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if got == 0:
            return None
        return self._buf[:got].reshape((got,) + self.sample_shape).copy()

    def __iter__(self):
        while True:
            b = self.next()
            if b is None:
                return
            yield b

    def close(self):
        if getattr(self, "_h", None):
            self._lib.dl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def write_archive(path: str, samples: np.ndarray):
    """Producer helper: raw little-endian f32 archive (numpy tofile)."""
    np.asarray(samples, np.float32).tofile(path)
