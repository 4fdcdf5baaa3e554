"""Forcing-data pipeline: binary writer + native windowed reader bindings.

The input complement of the trajectory sink (``runtime/io.py``): large
per-column forcing time series (wind, air temperature, humidity, rain ...)
are written once with :func:`write_forcing` and consumed by the device loop
in windows of timesteps through :class:`ForcingReader`, whose native backend
(``native/forcingreader.cpp``) mmaps the file and stages the *next* window
on a background thread while the device integrates the current one
(:func:`stream_windows` drives that overlap).  The reference has no data
loader — its forcing is a hard-coded closure
(``experiments/SoilModel/surface_fluxes.jl:61-87``); this subsystem is what
replaces it at 1e5-1e7 columns.

A pure-numpy ``np.memmap`` fallback keeps the API available when no C++
toolchain exists (``is_native`` tells which backend is live).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

_MAGIC = 0x31304352464A484C  # "LHJFRC01"
_DTYPE_BY_CODE = {0: np.float32, 1: np.float64}
_CODE_BY_DTYPE = {np.dtype(np.float32): 0, np.dtype(np.float64): 1}

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_DIR = os.path.join(_HERE, "_lib")
_LIB_PATH = os.path.join(_LIB_DIR, "libforcingreader.so")
_SRC_PATH = os.path.join(_HERE, "..", "..", "native", "forcingreader.cpp")

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
    lib.forcing_open.restype = ctypes.c_void_p
    lib.forcing_open.argtypes = [ctypes.c_char_p]
    lib.forcing_info.restype = ctypes.c_int
    lib.forcing_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.forcing_field_name.restype = ctypes.c_int
    lib.forcing_field_name.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_char_p, ctypes.c_uint32,
    ]
    lib.forcing_get_times.restype = ctypes.c_int
    lib.forcing_get_times.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
    ]
    lib.forcing_prefetch.restype = ctypes.c_int
    lib.forcing_prefetch.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
    ]
    lib.forcing_read.restype = ctypes.c_int
    lib.forcing_read.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
    ]
    lib.forcing_prefetch_hits.restype = ctypes.c_uint64
    lib.forcing_prefetch_hits.argtypes = [ctypes.c_void_p]
    lib.forcing_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    """True when the C++ reader built (or was already built) and loads."""
    return _ensure_lib() is not None


def write_forcing(
    path: str, times: np.ndarray, fields: Dict[str, np.ndarray]
) -> None:
    """Write a forcing file (format documented in ``forcingreader.cpp``).

    ``times``: (n_times,) float64 sample times; every field: (n_times,
    n_cols) arrays of one common float dtype.
    """
    times = np.ascontiguousarray(times, dtype=np.float64)
    if not fields:
        raise ValueError("at least one forcing field is required")
    names = sorted(fields)
    arrs = [np.ascontiguousarray(fields[k]) for k in names]
    dtype = arrs[0].dtype
    if dtype not in _CODE_BY_DTYPE:
        raise TypeError(f"unsupported forcing dtype {dtype}")
    n_times = times.shape[0]
    n_cols = arrs[0].shape[1] if arrs[0].ndim == 2 else 1
    for k, a in zip(names, arrs):
        if a.dtype != dtype:
            raise TypeError(f"field {k!r} dtype {a.dtype} != {dtype}")
        if a.reshape(n_times, -1).shape != (n_times, n_cols):
            raise ValueError(
                f"field {k!r} shape {a.shape} != ({n_times}, {n_cols})"
            )
    with open(path, "wb") as f:
        f.write(struct.pack("<QII QQ", _MAGIC, _CODE_BY_DTYPE[dtype],
                            len(names), n_times, n_cols))
        for k in names:
            b = k.encode()
            f.write(struct.pack("<I", len(b)))
            f.write(b)
        f.write(times.tobytes())
        # t-major, field-minor blocks of n_cols
        stacked = np.stack([a.reshape(n_times, n_cols) for a in arrs], axis=1)
        f.write(np.ascontiguousarray(stacked).tobytes())


class ForcingReader:
    """Windowed reader over a forcing file; native (mmap + prefetch thread)
    when the C++ library is available, ``np.memmap`` otherwise."""

    def __init__(self, path: str):
        self._path = path
        self._handle = None
        self._lib = _ensure_lib()
        if self._lib is not None:
            self._handle = self._lib.forcing_open(path.encode())
        if self._handle:
            dc = ctypes.c_uint32()
            nf = ctypes.c_uint32()
            nt = ctypes.c_uint64()
            nc = ctypes.c_uint64()
            self._lib.forcing_info(
                self._handle, ctypes.byref(dc), ctypes.byref(nf),
                ctypes.byref(nt), ctypes.byref(nc),
            )
            self.dtype = np.dtype(_DTYPE_BY_CODE[dc.value])
            self.n_times, self.n_cols = int(nt.value), int(nc.value)
            self.field_names = []
            buf = ctypes.create_string_buffer(256)
            for i in range(nf.value):
                self._lib.forcing_field_name(self._handle, i, buf, 256)
                self.field_names.append(buf.value.decode())
            t = np.empty(self.n_times, dtype=np.float64)
            self._lib.forcing_get_times(
                self._handle, t.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
            )
            self.times = t
        else:
            self._open_fallback(path)

    def _open_fallback(self, path: str) -> None:
        with open(path, "rb") as f:
            magic, dc, nf, nt, nc = struct.unpack("<QII QQ", f.read(32))
            if magic != _MAGIC:
                raise ValueError(f"{path}: not a forcing file")
            self.dtype = np.dtype(_DTYPE_BY_CODE[dc])
            self.n_times, self.n_cols = nt, nc
            self.field_names = []
            for _ in range(nf):
                (ln,) = struct.unpack("<I", f.read(4))
                self.field_names.append(f.read(ln).decode())
            self.times = np.frombuffer(f.read(8 * nt), dtype=np.float64).copy()
            offset = f.tell()
        self._mm = np.memmap(
            path, dtype=self.dtype, mode="r", offset=offset,
            shape=(self.n_times, len(self.field_names), self.n_cols),
        )

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    @property
    def prefetch_hits(self) -> int:
        if self._handle:
            return int(self._lib.forcing_prefetch_hits(self._handle))
        return 0

    def prefetch(self, i0: int, nt: int) -> None:
        """Stage window [i0, i0+nt) in the background (no-op on fallback)."""
        if self._handle:
            self._lib.forcing_prefetch(self._handle, i0, nt)

    def window(self, i0: int, nt: int) -> Dict[str, np.ndarray]:
        """Blocking read of window [i0, i0+nt): {field: (nt, n_cols)}."""
        if i0 < 0 or i0 + nt > self.n_times:
            raise IndexError(
                f"window [{i0}, {i0 + nt}) out of range [0, {self.n_times})"
            )
        nf = len(self.field_names)
        if self._handle:
            out = np.empty((nt, nf, self.n_cols), dtype=self.dtype)
            rc = self._lib.forcing_read(
                self._handle, i0, nt, out.ctypes.data_as(ctypes.c_void_p)
            )
            if rc != 0:
                raise IOError(f"forcing_read failed with code {rc}")
        else:
            out = np.asarray(self._mm[i0:i0 + nt])
        return {k: out[:, i, :] for i, k in enumerate(self.field_names)}

    def close(self) -> None:
        if self._handle:
            self._lib.forcing_close(self._handle)
            self._handle = None

    def __enter__(self) -> "ForcingReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def stream_windows(
    reader: ForcingReader, window: int, start: int = 0, stop: Optional[int] = None
) -> Iterator[Tuple[int, Dict[str, np.ndarray]]]:
    """Yield ``(i0, fields)`` windows, prefetching window k+1 while the
    caller consumes window k — the host-side half of IO/compute overlap
    (the device side is JAX's async dispatch: the jit segment for window k
    runs while Python stages k+1)."""
    stop = reader.n_times if stop is None else stop
    i0 = start
    first = min(window, stop - i0)
    if first <= 0:
        return
    reader.prefetch(i0, first)
    while i0 < stop:
        nt = min(window, stop - i0)
        nxt = i0 + nt
        cur = reader.window(i0, nt)
        if nxt < stop:
            reader.prefetch(nxt, min(window, stop - nxt))
        yield i0, cur
        i0 = nxt
