"""TensorBoard-compatible event-file writer, self-built (no TF dependency).

Replaces the reference's reliance on TF summaries
(/root/reference/trainers/model_utils.py:4-6 and Estimator internals;
README.md:106-112 documents the TensorBoard workflow). Encodes tensorflow
Event/Summary protos by hand (protobuf wire format) into TFRecord-framed
``events.out.tfevents.*`` files with masked CRC32C checksums — directly
loadable by TensorBoard. Supports scalars and histograms (the two summary
kinds the reference emits: loss/metric scalars and activation histograms).
"""

from __future__ import annotations

import struct
import time
from pathlib import Path

import numpy as np

# --- crc32c (Castagnoli), table-based ----------------------------------------

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE:
        return _CRC_TABLE
    poly = 0x82F63B78
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    _CRC_TABLE = table
    return table


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- protobuf wire encoding ---------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_double(field: int, value: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", value)


def _f_float(field: int, value: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", value)


def _f_varint(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def _f_bytes(field: int, value: bytes) -> bytes:
    return _key(field, 2) + _varint(len(value)) + value


def _f_packed_doubles(field: int, values) -> bytes:
    payload = b"".join(struct.pack("<d", float(v)) for v in values)
    return _f_bytes(field, payload)


def _summary_value_scalar(tag: str, value: float) -> bytes:
    # Summary.Value: tag=1 (string), simple_value=2 (float)
    return _f_bytes(1, tag.encode()) + _f_float(2, float(value))


def _histogram_proto(values: np.ndarray) -> bytes:
    """HistogramProto with TF's exponential bucket boundaries."""
    values = np.asarray(values, dtype=np.float64).ravel()
    if values.size == 0:
        values = np.zeros(1)
    # TF-style bucket limits: +-1e-12 * 1.1^k geometric grid
    limits = [1e-12]
    while limits[-1] < 1e20:
        limits.append(limits[-1] * 1.1)
    limits = np.array([-x for x in reversed(limits)] + [0.0] + limits)
    counts, _ = np.histogram(values, bins=np.concatenate([[-np.inf], limits]))
    nz = counts.nonzero()[0]
    if nz.size:
        lo, hi = nz[0], nz[-1] + 1
    else:
        lo, hi = 0, 1
    msg = (
        _f_double(1, float(values.min()))
        + _f_double(2, float(values.max()))
        + _f_double(3, float(values.size))
        + _f_double(4, float(values.sum()))
        + _f_double(5, float((values**2).sum()))
        + _f_packed_doubles(6, limits[lo:hi])
        + _f_packed_doubles(7, counts[lo:hi])
    )
    return msg


def _summary_value_histo(tag: str, values: np.ndarray) -> bytes:
    return _f_bytes(1, tag.encode()) + _f_bytes(5, _histogram_proto(values))


def _event(wall_time: float, step: int | None = None, summary: bytes | None = None,
           file_version: str | None = None) -> bytes:
    # Event: wall_time=1 (double), step=2 (int64), file_version=3, summary=5
    msg = _f_double(1, wall_time)
    if step is not None:
        msg += _f_varint(2, step)
    if file_version is not None:
        msg += _f_bytes(3, file_version.encode())
    if summary is not None:
        msg += _f_bytes(5, summary)
    return msg


class EventWriter:
    """Append-only TensorBoard event file under ``logdir``."""

    def __init__(self, logdir: str | Path, filename_suffix: str = ""):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.rectpu{filename_suffix}"
        self._f = (self.logdir / fname).open("ab")
        self._write_record(_event(time.time(), file_version="brain.Event:2"))

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._write_record(
            _event(time.time(), step=step, summary=summary_wrap(_summary_value_scalar(tag, value)))
        )

    def add_scalars(self, scalars: dict, step: int) -> None:
        summary = b"".join(
            _f_bytes(1, _summary_value_scalar(tag, v)) for tag, v in scalars.items()
        )
        self._write_record(_event(time.time(), step=step, summary=summary))

    def add_histogram(self, tag: str, values, step: int) -> None:
        summary = _f_bytes(1, _summary_value_histo(tag, np.asarray(values)))
        self._write_record(_event(time.time(), step=step, summary=summary))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.flush()
        self._f.close()


def summary_wrap(value_msg: bytes) -> bytes:
    """Wrap a single Summary.Value message into a Summary message."""
    return _f_bytes(1, value_msg)
