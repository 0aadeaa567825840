"""Tests for the native TFRecord pipeline (native/tfrecord.cc via
lbt_tpu/data/tfrecord.py) and the pure-Python writer it round-trips
against."""

import io
import os

import numpy as np
import pytest

from lbt_tpu.data import tfrecord as tfr

pytestmark = pytest.mark.skipif(
    not tfr.native_available(), reason="native tfrecord lib unavailable")


def _jpeg_bytes(rng, h, w):
    from PIL import Image
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _write_shards(tmp_path, n_shards=2, per_shard=10, seed=0, raw=False,
                  hw=(48, 64)):
    rng = np.random.default_rng(seed)
    paths, labels = [], []
    h, w = hw
    for s in range(n_shards):
        p = os.path.join(tmp_path, f"shard-{s:02d}.tfrecord")
        with tfr.TFRecordWriter(p) as wr:
            for i in range(per_shard):
                label = int(rng.integers(0, 5))
                if raw:
                    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    ex = tfr.make_example(img.tobytes(), label,
                                          height=h, width=w)
                else:
                    ex = tfr.make_example(_jpeg_bytes(rng, h, w), label)
                wr.write(ex)
                labels.append(label)
        paths.append(p)
    return paths, labels


def test_writer_roundtrip_python(tmp_path):
    paths, _ = _write_shards(str(tmp_path), n_shards=1, per_shard=5)
    recs = list(tfr.read_records(paths[0]))
    assert len(recs) == 5
    # CRC validation happens inside read_records; corrupt one byte
    data = bytearray(open(paths[0], "rb").read())
    data[20] ^= 0xFF
    bad = os.path.join(str(tmp_path), "bad.tfrecord")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        list(tfr.read_records(bad))


def test_native_count(tmp_path):
    paths, labels = _write_shards(str(tmp_path), n_shards=3, per_shard=7)
    ds = tfr.TFRecordDataset(paths, image_size=32, train=True)
    assert len(ds) == 21


def test_batches_shapes_and_range(tmp_path):
    paths, labels = _write_shards(str(tmp_path), n_shards=2, per_shard=10)
    ds = tfr.TFRecordDataset(paths, image_size=32, train=True, seed=1)
    seen = 0
    for x, y in ds.batches(0, 8):
        assert x.shape == (8, 32, 32, 3) and x.dtype == np.float32
        assert y.shape == (8,) and y.dtype == np.int32
        assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6
        assert set(y.tolist()) <= set(range(5))
        seen += len(y)
    assert seen == 16  # 20 records, drop-remainder at batch 8
    assert ds.skipped() == 0


def test_eval_keeps_remainder_and_order(tmp_path):
    paths, labels = _write_shards(str(tmp_path), n_shards=1, per_shard=10)
    ds = tfr.TFRecordDataset(paths, image_size=32, train=False)
    ys = np.concatenate([y for _, y in ds.batches(0, 4)])
    assert len(ys) == 10  # remainder kept
    np.testing.assert_array_equal(ys, np.asarray(labels, np.int32))


def test_deterministic_replay(tmp_path):
    paths, _ = _write_shards(str(tmp_path), n_shards=2, per_shard=10)
    a = tfr.TFRecordDataset(paths, image_size=32, train=True, seed=7)
    b = tfr.TFRecordDataset(paths, image_size=32, train=True, seed=7)
    for (xa, ya), (xb, yb) in zip(a.batches(3, 8), b.batches(3, 8)):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
    # different epoch -> different stream (shuffle + crops move)
    c = tfr.TFRecordDataset(paths, image_size=32, train=True, seed=7)
    xa = next(iter(a.batches(0, 8)))[0]
    xc = next(iter(c.batches(1, 8)))[0]
    assert not np.array_equal(xa, xc)


def test_raw_images(tmp_path):
    paths, labels = _write_shards(str(tmp_path), n_shards=1, per_shard=6,
                                  raw=True)
    ds = tfr.TFRecordDataset(paths, image_size=16, train=False)
    ys = np.concatenate([y for _, y in ds.batches(0, 6)])
    np.testing.assert_array_equal(ys, np.asarray(labels, np.int32))


def test_eval_center_crop_values(tmp_path):
    # constant-color image -> every output pixel equals the normalized
    # color regardless of crop/resize details
    from PIL import Image
    p = os.path.join(str(tmp_path), "c.tfrecord")
    arr = np.full((40, 56, 3), (200, 100, 50), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=100)
    with tfr.TFRecordWriter(p) as wr:
        wr.write(tfr.make_example(buf.getvalue(), 3))
    ds = tfr.TFRecordDataset([p], image_size=16, train=False)
    x, y = next(iter(ds.batches(0, 1)))
    expected = np.asarray([200, 100, 50], np.float32) / 127.5 - 1.0
    # JPEG is lossy: loose tolerance
    np.testing.assert_allclose(
        x[0].mean(axis=(0, 1)), expected, atol=0.05)
    assert y[0] == 3


def test_trainer_dict_contract(tmp_path):
    paths, _ = _write_shards(str(tmp_path), n_shards=2, per_shard=8)
    d = tfr.tfrecord_dataset(
        os.path.join(str(tmp_path), "*.tfrecord"),
        val_pattern=os.path.join(str(tmp_path), "*.tfrecord"),
        image_size=32, num_classes=5)
    assert d["n_train"] == 16 and d["n_test"] == 16
    x, y = next(iter(d["train_iter"](0, 4)))
    assert x.shape == (4, 32, 32, 3)
    x, y = next(iter(d["test_iter"](4)))
    assert x.shape == (4, 32, 32, 3)


def test_skips_corrupt_records(tmp_path):
    # a record whose payload is not a decodable image is skipped, the
    # rest of the shard still streams
    paths, labels = _write_shards(str(tmp_path), n_shards=1, per_shard=4)
    p2 = os.path.join(str(tmp_path), "mixed.tfrecord")
    with tfr.TFRecordWriter(p2) as wr:
        for rec in tfr.read_records(paths[0]):
            wr.write(rec)
        wr.write(tfr.make_example(b"\xff\xd8notajpeg", 0))
    ds = tfr.TFRecordDataset([p2], image_size=16, train=False)
    ys = np.concatenate([y for _, y in ds.batches(0, 8)])
    assert len(ys) == 4
    assert ds.skipped() == 1
