"""Dependency-free TensorBoard event-file writer.

The reference logs per-layer range/mean scalars plus loss/accuracy to
TensorBoard (reference dynamic_fixed_point.py:275-285, trainer.py:66-73).
This environment has no TensorFlow, so scalar summaries are serialized
by hand: TFRecord framing (length + masked CRC32C) around a minimal
protobuf encoding of `tensorflow.Event { wall_time, step, summary {
value { tag, simple_value } } }`.  Files are readable by stock
TensorBoard.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Dict, Iterator, Tuple

# -- CRC32C (Castagnoli), table-driven --------------------------------------

_POLY = 0x82F63B78
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (_POLY if _c & 1 else 0)
    _TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- minimal protobuf encoding ----------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _pb_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _pb_int64(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _pb_bytes(field: int, v: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(v)) + v


def _event(wall_time: float, step: int, payload: bytes = b"",
           file_version: str = "") -> bytes:
    # Event: 1=wall_time double, 2=step int64, 3=file_version string,
    #        5=summary Summary
    msg = _pb_double(1, wall_time) + _pb_int64(2, step)
    if file_version:
        msg += _pb_bytes(3, file_version.encode())
    if payload:
        msg += _pb_bytes(5, payload)
    return msg


def _scalar_summary(values: Dict[str, float]) -> bytes:
    # Summary: repeated Value value=1; Value: 1=tag string, 2=simple_value
    out = b""
    for tag, v in values.items():
        val = _pb_bytes(1, tag.encode()) + _pb_float(2, float(v))
        out += _pb_bytes(1, val)
    return out


class EventWriter:
    """Append-only tfevents file of scalar summaries."""

    def __init__(self, logdir: str, suffix: str = ""):
        os.makedirs(logdir, exist_ok=True)
        name = "events.out.tfevents.%010d.%s%s" % (
            int(time.time()), socket.gethostname(), suffix)
        self._f = open(os.path.join(logdir, name), "ab")
        self._record(_event(time.time(), 0, file_version="brain.Event:2"))

    def _record(self, payload: bytes):
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))
        self._f.flush()

    def scalars(self, step: int, values: Dict[str, float]):
        if not values:
            return
        self._record(
            _event(time.time(), int(step), _scalar_summary(values)))

    def close(self):
        self._f.close()


def read_events(path: str) -> Iterator[Tuple[int, Dict[str, float]]]:
    """Parse a tfevents file written by :class:`EventWriter` back into
    (step, {tag: value}) rows — used by tests to round-trip the format
    (CRCs are verified)."""
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (n,) = struct.unpack_from("<Q", data, pos)
        header = data[pos:pos + 8]
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        assert hcrc == _masked_crc(header), "header CRC mismatch"
        payload = data[pos + 12:pos + 12 + n]
        (pcrc,) = struct.unpack_from("<I", data, pos + 12 + n)
        assert pcrc == _masked_crc(payload), "payload CRC mismatch"
        pos += 12 + n + 4

        step, values = 0, {}
        i = 0
        while i < len(payload):
            key = payload[i]
            field, wire = key >> 3, key & 7
            i += 1
            if wire == 1:
                i += 8
            elif wire == 5:
                i += 4
            elif wire == 0:
                v = 0
                shift = 0
                while True:
                    b = payload[i]
                    i += 1
                    v |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                if field == 2:
                    step = v
            elif wire == 2:
                ln = 0
                shift = 0
                while True:
                    b = payload[i]
                    i += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                sub = payload[i:i + ln]
                i += ln
                if field == 5:  # summary
                    j = 0
                    while j < ln:
                        assert sub[j] == 0x0A  # Value, field 1, wire 2
                        j += 1
                        vl = 0
                        shift = 0
                        while True:
                            b = sub[j]
                            j += 1
                            vl |= (b & 0x7F) << shift
                            shift += 7
                            if not b & 0x80:
                                break
                        val = sub[j:j + vl]
                        j += vl
                        # Value: 1=tag (len-delim), 2=simple_value (f32)
                        k = 0
                        tag, sv = "", None
                        while k < vl:
                            fk = val[k]
                            k += 1
                            if fk == 0x0A:
                                tl = val[k]
                                k += 1
                                tag = val[k:k + tl].decode()
                                k += tl
                            elif fk == 0x15:
                                (sv,) = struct.unpack_from("<f", val, k)
                                k += 4
                            else:
                                raise AssertionError(fk)
                        if sv is not None:
                            values[tag] = sv
        if values:
            yield step, values
