"""ctypes bindings for the native record parser (native/record_parser.cpp).

Optional fast path for the training data loader: TFRecord framing and
float/int64 feature extraction in C++ (compiled on first use). The pure
Python codec in data/tfrecord.py remains the reference implementation
and the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_LIB = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
    )


def load_library():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = os.path.join(_native_dir(), "record_parser.cpp")
    so = os.path.join(_native_dir(), "librecord_parser.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.tfr_open.restype = ctypes.c_void_p
        lib.tfr_open.argtypes = [ctypes.c_char_p]
        lib.tfr_next.restype = ctypes.c_long
        lib.tfr_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))
        ]
        lib.tfr_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.tfr_close.argtypes = [ctypes.c_void_p]
        for fn, ctype in (
            ("example_get_floats", ctypes.POINTER(ctypes.c_float)),
            ("example_get_ints", ctypes.POINTER(ctypes.c_longlong)),
        ):
            g = getattr(lib, fn)
            g.restype = ctypes.c_long
            g.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.c_char_p, ctype, ctypes.c_long,
            ]
        lib.example_get_count.restype = ctypes.c_long
        lib.example_get_count.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_char_p
        ]
        lib.example_get_floats_range.restype = ctypes.c_long
        lib.example_get_floats_range.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
        _LIB = None
    return _LIB


def read_tfrecord_native(path: str) -> Iterator[bytes]:
    """Native-framing record iterator (CRC unchecked: fast path)."""
    lib = load_library()
    if lib is None:
        from human_dynamics_tpu.data.tfrecord import read_tfrecord

        yield from read_tfrecord(path)
        return
    handle = lib.tfr_open(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        while True:
            buf = ctypes.POINTER(ctypes.c_uint8)()
            n = lib.tfr_next(handle, ctypes.byref(buf))
            if n == 0:
                return
            if n < 0:
                raise IOError(f"Corrupt record in {path}")
            try:
                yield ctypes.string_at(buf, n)
            finally:
                lib.tfr_free(buf)
    finally:
        lib.tfr_close(handle)


class NativeExample:
    """Zero-copy-ish feature extraction from a serialized Example."""

    def __init__(self, serialized: bytes):
        self._lib = load_library()
        self._data = serialized
        self._buf = ctypes.cast(
            ctypes.create_string_buffer(serialized, len(serialized)),
            ctypes.POINTER(ctypes.c_uint8),
        )
        self._len = len(serialized)

    def count(self, key: str) -> int:
        return int(self._lib.example_get_count(
            self._buf, self._len, key.encode()
        ))

    def floats(self, key: str) -> Optional[np.ndarray]:
        n = self.count(key)
        if n < 0:
            return None
        out = np.empty(n, np.float32)
        got = self._lib.example_get_floats(
            self._buf, self._len, key.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        )
        if got < 0:
            return None
        return out[:got]

    def floats_range(
        self, key: str, offset: int, count: int
    ) -> Optional[np.ndarray]:
        """Floats [offset, offset+count) of a FloatList, skipping the
        prefix without copying (the loader's windowed-tube hot path)."""
        out = np.empty(count, np.float32)
        got = self._lib.example_get_floats_range(
            self._buf, self._len, key.encode(), offset,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), count,
        )
        if got < 0:
            return None
        return out[:got]

    def ints(self, key: str) -> Optional[np.ndarray]:
        n = self.count(key)
        if n < 0:
            return None
        out = np.empty(n, np.int64)
        got = self._lib.example_get_ints(
            self._buf, self._len, key.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), n,
        )
        if got < 0:
            return None
        return out[:got]
