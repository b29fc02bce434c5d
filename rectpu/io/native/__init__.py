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
        if hasattr(lib, "rectpu_json_parse"):
            # serving request fast path; older .so files skip it
            lib.rectpu_json_parse.restype = ctypes.c_void_p
            lib.rectpu_json_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.rectpu_json_error.restype = ctypes.c_char_p
            lib.rectpu_json_error.argtypes = [ctypes.c_void_p]
            lib.rectpu_json_rows.restype = ctypes.c_int64
            lib.rectpu_json_rows.argtypes = [ctypes.c_void_p]
            lib.rectpu_json_cols.restype = ctypes.c_int64
            lib.rectpu_json_cols.argtypes = [ctypes.c_void_p]
            lib.rectpu_json_col_info.restype = ctypes.c_int
            lib.rectpu_json_col_info.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.rectpu_json_col_copy.restype = ctypes.c_int
            lib.rectpu_json_col_copy.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ]
            lib.rectpu_json_free.restype = None
            lib.rectpu_json_free.argtypes = [ctypes.c_void_p]
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
    encoded = [
        bytes(v) if isinstance(v, (bytes, np.bytes_)) else str(v).encode("utf-8")
        for v in values
    ]
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


def parse_json_instances(body: bytes):
    """Serving request fast path: parse ``{"instances": [{...}, ...]}`` bytes
    straight into column arrays — int64 / float64 vectors and NUL-padded
    S-dtype byte columns (the exact layout hash_strings_array consumes) —
    with zero per-value Python objects.

    Returns ``(columns dict, n_rows)`` or ``None`` when the native library is
    unbuilt or the body falls outside the fast shape (escapes, non-ASCII,
    nested values, inconsistent keys, extra top-level keys, malformed JSON) —
    callers MUST fall back to the json.loads path, which defines behavior.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "rectpu_json_parse"):
        return None
    h = lib.rectpu_json_parse(body, len(body))
    try:
        if lib.rectpu_json_error(h) is not None:
            return None
        rows = int(lib.rectpu_json_rows(h))
        columns = {}
        for i in range(int(lib.rectpu_json_cols(h))):
            name = ctypes.c_char_p()
            name_len = ctypes.c_int64()
            kind = ctypes.c_int64()
            stride = ctypes.c_int64()
            if lib.rectpu_json_col_info(h, i, ctypes.byref(name),
                                        ctypes.byref(name_len),
                                        ctypes.byref(kind),
                                        ctypes.byref(stride)) != 0:
                return None
            if kind.value == 0:
                out = np.empty(rows, dtype=np.int64)
            elif kind.value == 1:
                out = np.empty(rows, dtype=np.float64)
            else:
                # pre-zeroed: the C side only writes each value's bytes,
                # the NUL padding comes from here
                out = np.zeros(rows, dtype=f"S{stride.value}")
            if rows and lib.rectpu_json_col_copy(
                    h, i, out.ctypes.data_as(ctypes.c_void_p)) != 0:
                return None
            columns[name.value.decode("utf-8")] = out
        return columns, rows
    finally:
        lib.rectpu_json_free(h)


def load_and_encode(csv_path: str, feature_set, label_col: str, cutoff: int) -> dict:
    """Parse + encode a CSV fully natively. Falls back per-column where the
    native parser does not cover a feature kind."""
    from rectpu.io.native.csv_bridge import load_and_encode as _impl

    return _impl(csv_path, feature_set, label_col, cutoff)
