"""Native (C++) input-pipeline bindings.

The shared library is built from rectpu/io/native/*.cc via
``python -m rectpu.io.native.build`` (plain g++, no external deps) and loaded
through ctypes. All entry points degrade gracefully: ``available()`` is False
until the library is built, and the Python loader falls back to the pandas
path with identical semantics.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB = None
_LIB_TRIED = False

_HERE = Path(__file__).parent
LIB_PATH = _HERE / "librectpu_io.so"


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(LIB_PATH))
        lib.rectpu_fingerprint64.restype = ctypes.c_uint64
        lib.rectpu_fingerprint64.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.rectpu_hash_strings.restype = None
        lib.rectpu_hash_strings.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_size_t,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rectpu_hash_ints.restype = None
        lib.rectpu_hash_ints.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_size_t,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        if hasattr(lib, "rectpu_hash_strings_fixed"):
            # present from the first rebuild after this binding was added;
            # older .so files simply skip the fast fixed-stride path
            lib.rectpu_hash_strings_fixed.restype = None
            lib.rectpu_hash_strings_fixed.argtypes = [
                ctypes.POINTER(ctypes.c_char),
                ctypes.c_int64,
                ctypes.c_size_t,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def fingerprint64(s: bytes) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    return int(lib.rectpu_fingerprint64(s, len(s)))


def hash_ints(values: np.ndarray, num_buckets: int) -> np.ndarray:
    """Hash int64 values (decimal stringified in C++) into buckets."""
    lib = _load()
    values = np.ascontiguousarray(values, dtype=np.int64)
    out = np.empty(values.shape, dtype=np.int32)
    lib.rectpu_hash_ints(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        values.size,
        num_buckets,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def hash_strings(values, num_buckets: int) -> np.ndarray:
    lib = _load()
    encoded = [str(v).encode("utf-8") for v in values]
    arr = (ctypes.c_char_p * len(encoded))(*encoded)
    out = np.empty(len(encoded), dtype=np.int32)
    lib.rectpu_hash_strings(
        arr, len(encoded), num_buckets, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    return out


def hash_strings_array(values: np.ndarray, num_buckets: int) -> np.ndarray:
    """Hash a numpy S-dtype (bytes) array without per-element marshalling:
    one fixed-stride C call over the contiguous NUL-padded buffer. Elements
    with embedded NULs are unrepresentable in S-dtype — callers convert via
    np.asarray(..., np.bytes_), which preserves all bytes up to the pad."""
    lib = _load()
    if not hasattr(lib, "rectpu_hash_strings_fixed"):
        raise RuntimeError("native lib predates rectpu_hash_strings_fixed; rebuild")
    values = np.ascontiguousarray(values)
    assert values.dtype.kind == "S", values.dtype
    out = np.empty(values.size, dtype=np.int32)
    lib.rectpu_hash_strings_fixed(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
        values.dtype.itemsize,
        values.size,
        num_buckets,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out.reshape(values.shape)


def load_and_encode(csv_path: str, feature_set, label_col: str, cutoff: int) -> dict:
    """Parse + encode a CSV fully natively. Falls back per-column where the
    native parser does not cover a feature kind."""
    from rectpu.io.native.csv_bridge import load_and_encode as _impl

    return _impl(csv_path, feature_set, label_col, cutoff)
