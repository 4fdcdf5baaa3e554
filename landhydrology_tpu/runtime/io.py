"""ctypes bindings for the native async trajectory sink.

The shared library is built from ``native/trajsink.cpp`` (``make -C
native``); if it is missing, :func:`_ensure_lib` attempts an on-demand
build with ``g++``.  A pure-Python synchronous fallback keeps the API
usable in environments without a toolchain (``native_available()`` reports
which path is active).

Python-side file reader: :func:`read_trajectory` returns the list of
``(step, t, {name: array})`` records.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

_MAGIC = 0x4C484A54534E4B31
_DTYPE_CODES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float64): 1,
    np.dtype(np.int32): 2,
    np.dtype(np.int64): 3,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}

_LIB_DIR = os.path.join(os.path.dirname(__file__), "_lib")
_LIB_PATH = os.path.join(_LIB_DIR, "libtrajsink.so")
_SRC_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "trajsink.cpp"
)

_lib = None
_lib_tried = False


def _ensure_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    needs_build = not os.path.exists(_LIB_PATH) or (
        os.path.exists(_SRC_PATH)
        and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
    )
    if needs_build and os.path.exists(_SRC_PATH):
        try:
            os.makedirs(_LIB_DIR, exist_ok=True)
            subprocess.run(
                [
                    "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
                    os.path.abspath(_SRC_PATH), "-o", _LIB_PATH,
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.trajsink_open.restype = ctypes.c_void_p
    lib.trajsink_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int]
    lib.trajsink_append.restype = ctypes.c_int
    lib.trajsink_append.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_double,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.trajsink_flush.argtypes = [ctypes.c_void_p]
    lib.trajsink_records_written.restype = ctypes.c_uint64
    lib.trajsink_records_written.argtypes = [ctypes.c_void_p]
    lib.trajsink_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    """True when the C++ sink is loadable (building it if needed)."""
    return _ensure_lib() is not None


class TrajectorySink:
    """Stream ``(step, t, {name: array})`` records to disk asynchronously.

    Uses the native background-thread writer when available; otherwise a
    synchronous Python fallback writing the identical format.
    """

    def __init__(self, path: str, max_pending: int = 16, append: bool = False):
        self.path = path
        self._handle = None
        self._file = None
        self._records = 0
        lib = _ensure_lib()
        if lib is not None:
            self._handle = lib.trajsink_open(
                path.encode(), ctypes.c_uint64(max_pending), int(append)
            )
        if self._handle is None:
            fresh = not (
                append and os.path.exists(path) and os.path.getsize(path) > 0
            )
            self._file = open(path, "wb" if fresh else "ab")
            if fresh:
                self._file.write(struct.pack("<Q", _MAGIC))

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def append(self, step: int, t: float, arrays: Dict[str, Any]) -> None:
        np_arrays = {
            k: np.ascontiguousarray(np.asarray(v)) for k, v in arrays.items()
        }
        for v in np_arrays.values():
            if v.dtype not in _DTYPE_CODES:
                raise TypeError(f"unsupported dtype {v.dtype}")
        if self._handle is not None:
            lib = _lib
            n = len(np_arrays)
            names = (ctypes.c_char_p * n)(
                *[k.encode() for k in np_arrays.keys()]
            )
            codes = (ctypes.c_uint32 * n)(
                *[_DTYPE_CODES[v.dtype] for v in np_arrays.values()]
            )
            ndims = (ctypes.c_uint32 * n)(*[v.ndim for v in np_arrays.values()])
            all_dims = [d for v in np_arrays.values() for d in v.shape]
            shapes = (ctypes.c_uint64 * len(all_dims))(*all_dims)
            bufs = (ctypes.c_void_p * n)(
                *[v.ctypes.data_as(ctypes.c_void_p).value for v in np_arrays.values()]
            )
            nbytes = (ctypes.c_uint64 * n)(*[v.nbytes for v in np_arrays.values()])
            rc = lib.trajsink_append(
                self._handle, step, float(t), n, names, codes, ndims, shapes,
                bufs, nbytes,
            )
            if rc != 0:
                raise IOError(f"trajsink_append failed with {rc}")
        else:
            f = self._file
            f.write(struct.pack("<Qd I", step, float(t), len(np_arrays)))
            for name, v in np_arrays.items():
                nb = name.encode()
                f.write(struct.pack("<I", len(nb)))
                f.write(nb)
                f.write(struct.pack("<II", _DTYPE_CODES[v.dtype], v.ndim))
                f.write(struct.pack(f"<{v.ndim}Q", *v.shape))
                f.write(struct.pack("<Q", v.nbytes))
                f.write(v.tobytes())
        self._records += 1

    def flush(self) -> None:
        if self._handle is not None:
            _lib.trajsink_flush(self._handle)
        elif self._file:
            self._file.flush()

    def records_written(self) -> int:
        if self._handle is not None:
            self.flush()
            return int(_lib.trajsink_records_written(self._handle))
        return self._records

    def close(self) -> None:
        if self._handle is not None:
            _lib.trajsink_close(self._handle)
            self._handle = None
        elif self._file:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_trajectory(path: str) -> List[Tuple[int, float, Dict[str, np.ndarray]]]:
    """Read a sink file back into ``[(step, t, {name: array}), ...]``."""
    out = []
    with open(path, "rb") as f:
        (magic,) = struct.unpack("<Q", f.read(8))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a trajectory sink file")
        while True:
            head = f.read(8 + 8 + 4)
            if len(head) < 20:
                break
            step, t, n = struct.unpack("<Qd I", head)
            arrays = {}
            for _ in range(n):
                (name_len,) = struct.unpack("<I", f.read(4))
                name = f.read(name_len).decode()
                code, ndim = struct.unpack("<II", f.read(8))
                shape = struct.unpack(f"<{ndim}Q", f.read(8 * ndim))
                (nbytes,) = struct.unpack("<Q", f.read(8))
                data = f.read(nbytes)
                arrays[name] = np.frombuffer(
                    data, dtype=_CODE_DTYPES[code]
                ).reshape(shape)
            out.append((step, t, arrays))
    return out
