"""TFRecord ingestion: ctypes binding for the native pipeline
(native/tfrecord.cc) plus a pure-Python writer.

TFRecord is the standard at-scale storage format for ImageNet-class
training corpora (sharded files of length-prefixed, CRC32C-framed
tf.Example protos).  The reference never reached this scale — its
orphaned torchvision module only scoped directory-tree ImageNet
ingestion (reference data.py:58-93) — so this module is new capability:
shards stream through a C++ producer (record framing -> minimal
protobuf walk -> libjpeg decode -> RandomResizedCrop/flip train or
resize+center-crop eval -> normalized f32 NHWC batches) that overlaps
decode with device compute, GIL-free.

The writer exists so corpora can be produced (and tests round-trip)
without TensorFlow: it emits standard frames readable by any TFRecord
consumer.

Feature schema (ImageNet convention): ``image/encoded`` (JPEG bytes, or
raw uint8 HWC with ``image/height``/``image/width``),
``image/class/label`` (int64).  Key names are configurable.

Determinism: shard order, shuffle-buffer eviction and every crop/flip
derive from (seed, epoch, position) counters — a given (seed, epoch)
replays exactly.
"""

from __future__ import annotations

import ctypes
import glob as _glob
import os
import struct
import subprocess
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "tfrecord.cc")
_LIB = os.path.join(_REPO, "native", "liblbt_tfrecord.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SRC):
            _build_failed = True
            return None
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["make", "-C", os.path.dirname(_SRC),
                     "liblbt_tfrecord.so"],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.lbt_tfr_create.restype = ctypes.c_void_p
        lib.lbt_tfr_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.lbt_tfr_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.lbt_tfr_next.restype = ctypes.c_int
        lib.lbt_tfr_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.lbt_tfr_skipped.restype = ctypes.c_long
        lib.lbt_tfr_skipped.argtypes = [ctypes.c_void_p]
        lib.lbt_tfr_destroy.argtypes = [ctypes.c_void_p]
        lib.lbt_tfr_count.restype = ctypes.c_long
        lib.lbt_tfr_count.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# CRC32C + TFRecord framing (pure Python, for the writer)
# ---------------------------------------------------------------------------

_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        t = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (0x82F63B78 ^ (c >> 1)) if (c & 1) else (c >> 1)
            t.append(c)
        _CRC_TABLE = t
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    t = _crc_table()
    c = 0xFFFFFFFF
    for b in data:
        c = t[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _int64_feature(v: int) -> bytes:
    int64_list = _varint((1 << 3) | 0) + _varint(v)
    return _len_field(3, int64_list)


def _bytes_feature(v: bytes) -> bytes:
    return _len_field(1, _len_field(1, v))


def make_example(image: bytes, label: int, height: Optional[int] = None,
                 width: Optional[int] = None,
                 image_key: str = "image/encoded",
                 label_key: str = "image/class/label") -> bytes:
    """Serialize one tf.Example (minimal wire-format, no TF needed)."""
    entries = [
        (image_key, _bytes_feature(image)),
        (label_key, _int64_feature(int(label))),
    ]
    if height is not None:
        entries.append(("image/height", _int64_feature(int(height))))
    if width is not None:
        entries.append(("image/width", _int64_feature(int(width))))
    features = b"".join(
        _len_field(1, _len_field(1, k.encode()) + _len_field(2, f))
        for k, f in entries
    )
    return _len_field(1, features)


class TFRecordWriter:
    """Minimal TFRecord shard writer (standard framing)."""

    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, record: bytes) -> None:
        hdr = struct.pack("<Q", len(record))
        self._f.write(hdr)
        self._f.write(struct.pack("<I", masked_crc(hdr)))
        self._f.write(record)
        self._f.write(struct.pack("<I", masked_crc(record)))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_records(path: str) -> Iterator[bytes]:
    """Pure-Python record iterator (verifies CRCs) — the reference
    implementation the native reader is tested against."""
    with open(path, "rb") as f:
        while True:
            hdr = f.read(12)
            if len(hdr) < 12:
                return
            (length,) = struct.unpack("<Q", hdr[:8])
            (lcrc,) = struct.unpack("<I", hdr[8:12])
            if masked_crc(hdr[:8]) != lcrc:
                raise ValueError(f"bad length CRC in {path!r}")
            data = f.read(length)
            tail = f.read(4)
            if len(data) < length or len(tail) < 4:
                return
            (dcrc,) = struct.unpack("<I", tail)
            if masked_crc(data) != dcrc:
                raise ValueError(f"bad data CRC in {path!r}")
            yield data


# ---------------------------------------------------------------------------
# dataset over shards (native pipeline)
# ---------------------------------------------------------------------------


class TFRecordDataset:
    """Shard-backed dataset with the ImageFolderDataset iteration API."""

    def __init__(self, pattern, image_size: int = 224, train: bool = True,
                 seed: int = 0, workers: int = 0,
                 shuffle_buffer: int = 1024,
                 image_key: str = "image/encoded",
                 label_key: str = "image/class/label",
                 check_crc: bool = True,
                 num_classes: Optional[int] = None):
        if isinstance(pattern, str):
            self.paths = sorted(_glob.glob(pattern))
        else:
            self.paths = [str(p) for p in pattern]
        if not self.paths:
            raise ValueError(f"no TFRecord shards match {pattern!r}")
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native TFRecord pipeline unavailable (build failed)")
        self._lib = lib
        self.image_size = int(image_size)
        self.train = bool(train)
        self.seed = int(seed)
        self.workers = int(workers)
        self.shuffle_buffer = int(shuffle_buffer)
        self.image_key = image_key
        self.label_key = label_key
        self.check_crc = bool(check_crc)
        self.num_classes = num_classes
        self._n: Optional[int] = None
        self._handle = None
        self._handle_batch = None

    def _c_paths(self):
        arr = (ctypes.c_char_p * len(self.paths))()
        arr[:] = [p.encode() for p in self.paths]
        return arr

    def __len__(self) -> int:
        if self._n is None:
            self._n = int(self._lib.lbt_tfr_count(
                self._c_paths(), len(self.paths), int(self.check_crc)))
        return self._n

    def close(self) -> None:
        if self._handle is not None:
            self._lib.lbt_tfr_destroy(self._handle)
            self._handle = None

    def __del__(self):  # best-effort
        try:
            self.close()
        except Exception:
            pass

    def skipped(self) -> int:
        """Records dropped as malformed/undecodable so far."""
        if self._handle is None:
            return 0
        return int(self._lib.lbt_tfr_skipped(self._handle))

    def batches(self, epoch: int, batch_size: int,
                drop_remainder: Optional[bool] = None,
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (x f32 [B,S,S,3] in ~[-1,1], y int32 [B]) batches.

        Train: shard-order + buffer shuffle (seeded), drop_remainder.
        Eval: shard order, remainder kept.  (drop_remainder is decided
        natively by the train flag; the argument is accepted for API
        parity with ImageFolderDataset.)
        """
        del drop_remainder  # native side: train drops, eval keeps
        if self._handle is not None and self._handle_batch != batch_size:
            self.close()
        if self._handle is None:
            self._handle = self._lib.lbt_tfr_create(
                self._c_paths(), len(self.paths), int(batch_size),
                self.image_size, int(self.train),
                ctypes.c_uint64(self.seed), self.workers,
                self.shuffle_buffer, self.image_key.encode(),
                self.label_key.encode(), int(self.check_crc))
            self._handle_batch = batch_size
        s = self.image_size
        x = np.empty((batch_size, s, s, 3), np.float32)
        y = np.empty((batch_size,), np.int32)
        self._lib.lbt_tfr_start_epoch(self._handle, int(epoch))
        while True:
            cnt = self._lib.lbt_tfr_next(
                self._handle,
                x.ctypes.data_as(ctypes.c_void_p),
                y.ctypes.data_as(ctypes.c_void_p))
            if cnt <= 0:
                return
            yield x[:cnt].copy(), y[:cnt].copy()


def tfrecord_dataset(train_pattern, val_pattern=None, image_size: int = 224,
                     seed: int = 0, workers: int = 0,
                     shuffle_buffer: int = 1024,
                     num_classes: Optional[int] = None, **kw) -> Dict:
    """Trainer-ready dict for TFRecord shards (same contract as
    ``lbt_tpu.data.imagefolder.streaming_dataset``)."""
    tr = TFRecordDataset(train_pattern, image_size, train=True, seed=seed,
                         workers=workers, shuffle_buffer=shuffle_buffer,
                         num_classes=num_classes, **kw)
    ev = (TFRecordDataset(val_pattern, image_size, train=False, seed=seed,
                          workers=workers, num_classes=num_classes, **kw)
          if val_pattern else None)

    def train_iter(epoch: int, batch_size: int):
        return tr.batches(epoch, batch_size)

    def test_iter(batch_size: int):
        if ev is None:
            return iter(())
        return ev.batches(0, batch_size)

    if num_classes is None:
        raise ValueError(
            "num_classes is required for TFRecord data (labels are not "
            "enumerable without a full scan)")
    return {
        "train_iter": train_iter,
        "test_iter": test_iter,
        "n_train": len(tr),
        "n_test": len(ev) if ev else 0,
        "num_classes": num_classes,
        "input_shape": (image_size, image_size, 3),
        "synthetic": False,
    }
