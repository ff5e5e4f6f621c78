"""Binary-model I/O: Python binding for the native CTBM serializer.

(ref: binary model save/load — csinn_import_binary_model,
source/nn2/format.c:1304-1331; shl_gref_load_binary_model,
source/graph_ref/setup.c:929-977.)  The native library
(native/bmfmt.cpp) writes 4096-aligned sections and mmaps them back
zero-copy; this module maps numpy dtypes to the C ABI and auto-builds the
.so with the in-image toolchain on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SO = os.path.join(_NATIVE_DIR, "libbmfmt.so")
_MAX_NAME = 192
_MAX_DIMS = 8

# dtype codes: stable small ints (not numpy internals) for the on-disk format
_DTYPE_CODES = {
    "int8": 1, "uint8": 2, "int16": 3, "uint16": 4, "int32": 5, "uint32": 6,
    "int64": 7, "float16": 8, "float32": 9, "float64": 10, "bool": 11,
    "bfloat16": 12,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}

_lib = None


def _dtype_code(dt) -> int:
    name = str(dt)
    if name not in _DTYPE_CODES:
        raise ValueError(f"unsupported dtype {name}")
    return _DTYPE_CODES[name]


def _np_dtype(code: int):
    name = _CODE_DTYPES[code]
    if name == "bfloat16":
        import jax.numpy as jnp
        return np.dtype(jnp.bfloat16)
    return np.dtype(name)


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    lib = ctypes.CDLL(_SO)
    lib.ctbm_writer_open.restype = ctypes.c_void_p
    lib.ctbm_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.ctbm_writer_add.restype = ctypes.c_int
    lib.ctbm_writer_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int32, ctypes.c_int32,
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_void_p, ctypes.c_uint64]
    lib.ctbm_writer_close.restype = ctypes.c_int
    lib.ctbm_writer_close.argtypes = [ctypes.c_void_p]
    lib.ctbm_open.restype = ctypes.c_void_p
    lib.ctbm_open.argtypes = [ctypes.c_char_p]
    lib.ctbm_n_sections.restype = ctypes.c_uint64
    lib.ctbm_n_sections.argtypes = [ctypes.c_void_p]
    lib.ctbm_section.restype = ctypes.c_void_p
    lib.ctbm_section.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                 ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.POINTER(ctypes.c_uint64)]
    lib.ctbm_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def save_bm(path: str, tensors: Dict[str, np.ndarray]) -> str:
    """Write a CTBM file (native writer; 4096-aligned sections)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native bmfmt library unavailable (no compiler?)")
    w = lib.ctbm_writer_open(path.encode(), len(tensors))
    if not w:
        raise IOError(f"cannot open {path}")
    try:
        for name, arr in tensors.items():
            arr = np.ascontiguousarray(arr)
            shape = (ctypes.c_int64 * _MAX_DIMS)(*arr.shape)
            rc = lib.ctbm_writer_add(
                w, name.encode(), _dtype_code(arr.dtype), arr.ndim, shape,
                arr.ctypes.data_as(ctypes.c_void_p) if arr.size else None,
                arr.nbytes)
            if rc != 0:
                raise IOError(f"write failed for {name}: rc={rc}")
    finally:
        rc = lib.ctbm_writer_close(w)
    if rc != 0:
        raise IOError(f"close failed: rc={rc}")
    return path


class BinaryModel:
    """mmap'd CTBM file; tensors() returns zero-copy numpy views."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native bmfmt library unavailable")
        self._lib = lib
        self._r = lib.ctbm_open(path.encode())
        if not self._r:
            raise IOError(f"cannot open/parse {path}")
        self.path = path

    def tensors(self) -> Dict[str, np.ndarray]:
        out = {}
        n = self._lib.ctbm_n_sections(self._r)
        for i in range(n):
            name = ctypes.create_string_buffer(_MAX_NAME)
            dtype = ctypes.c_int32()
            ndim = ctypes.c_int32()
            shape = (ctypes.c_int64 * _MAX_DIMS)()
            nbytes = ctypes.c_uint64()
            ptr = self._lib.ctbm_section(self._r, i, name, ctypes.byref(dtype),
                                         ctypes.byref(ndim), shape,
                                         ctypes.byref(nbytes))
            if not ptr:
                raise IOError(f"bad section {i}")
            shp = tuple(shape[j] for j in range(ndim.value))
            npdt = _np_dtype(dtype.value)
            buf = (ctypes.c_char * nbytes.value).from_address(ptr)
            arr = np.frombuffer(buf, dtype=npdt).reshape(shp)
            arr.flags.writeable = False
            out[name.value.decode()] = arr
        return out

    def close(self):
        if self._r:
            self._lib.ctbm_close(self._r)
            self._r = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def load_bm(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors (views remain valid while the BinaryModel lives —
    this convenience copies them out)."""
    with BinaryModel(path) as bm:
        return {k: np.array(v) for k, v in bm.tensors().items()}
