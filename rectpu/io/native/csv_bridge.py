"""Python side of the native CSV loader: FeatureSet -> spec DSL -> encoded arrays."""

from __future__ import annotations

import ctypes

import numpy as np

from rectpu.features.schema import (
    BucketizedFeature,
    FeatureSet,
    HashFeature,
    IdentityFeature,
    VocabFeature,
)


def build_spec(feature_set: FeatureSet, label_col: str, cutoff: float) -> str:
    lines = []
    for f in feature_set.categorical:
        if isinstance(f, HashFeature):
            kind = "int" if f.dtype == "int32" else "str"
            lines.append(f"hash:{f.name}:{f.num_buckets}:{kind}")
        elif isinstance(f, VocabFeature):
            lines.append(f"vocab:{f.name}:{f.num_oov_buckets}:{','.join(f.vocab)}")
        elif isinstance(f, BucketizedFeature):
            bounds = ",".join(repr(float(b)) for b in f.boundaries)
            lines.append(f"bucket:{f.name}:{bounds}")
        elif isinstance(f, IdentityFeature):
            lines.append(f"identity:{f.name}:{f.num_buckets}")
        else:
            raise TypeError(f"native loader cannot encode {type(f).__name__}")
    for f in feature_set.numeric:
        lines.append(f"numeric:{f.name}")
    lines.append(f"label:{label_col}:{cutoff}")
    return "\n".join(lines)


def _bind(lib):
    lib.rectpu_csv_open.restype = ctypes.c_void_p
    lib.rectpu_csv_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.rectpu_csv_open_mem.restype = ctypes.c_void_p
    lib.rectpu_csv_open_mem.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int]
    lib.rectpu_csv_rows.restype = ctypes.c_int64
    lib.rectpu_csv_rows.argtypes = [ctypes.c_void_p]
    lib.rectpu_csv_error.restype = ctypes.c_char_p
    lib.rectpu_csv_error.argtypes = [ctypes.c_void_p]
    lib.rectpu_csv_encode.restype = ctypes.c_int
    lib.rectpu_csv_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rectpu_csv_free.argtypes = [ctypes.c_void_p]
    return lib


def _encode_handle(lib, h, feature_set, label_col, cutoff):
    try:
        err = lib.rectpu_csv_error(h)
        if err:
            raise RuntimeError(f"native csv open failed: {err.decode()}")
        rows = lib.rectpu_csv_rows(h)
        n_cat = feature_set.num_fields
        n_num = feature_set.num_numeric
        cat_ids = np.empty((rows, n_cat), dtype=np.int32)
        num_vals = np.empty((rows, max(n_num, 1)), dtype=np.float32)
        labels = np.empty((rows,), dtype=np.float32)
        spec = build_spec(feature_set, label_col, cutoff)
        rc = lib.rectpu_csv_encode(
            h, spec.encode(),
            cat_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            err = lib.rectpu_csv_error(h)
            raise RuntimeError(f"native csv encode failed: {err.decode() if err else rc}")
        if n_num == 0:
            num_vals = np.zeros((rows, 0), dtype=np.float32)
        return {"cat_ids": cat_ids, "num_vals": num_vals, "labels": labels}
    finally:
        lib.rectpu_csv_free(h)


def encode_bytes(data: bytes, feature_set: FeatureSet, label_col: str, cutoff: float) -> dict:
    """Encode a window of CSV bytes (header line included) — the streaming
    loader's per-chunk entry point; the file is never resident."""
    from rectpu.io import native

    lib = native._load()
    if lib is None:
        raise RuntimeError("native library not built")
    _bind(lib)
    h = lib.rectpu_csv_open_mem(data, len(data), 8)
    return _encode_handle(lib, h, feature_set, label_col, cutoff)


def load_and_encode(csv_path: str, feature_set: FeatureSet, label_col: str, cutoff: float) -> dict:
    from rectpu.io import native

    lib = native._load()
    if lib is None:
        raise RuntimeError("native library not built")
    _bind(lib)

    h = lib.rectpu_csv_open(str(csv_path).encode(), 8)
    return _encode_handle(lib, h, feature_set, label_col, cutoff)
