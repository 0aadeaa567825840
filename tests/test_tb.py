"""TensorBoard event-file round trip (pure-Python writer/reader with
verified TFRecord CRC32C framing)."""

import glob

from lbt_tpu.utils.tb import EventWriter, read_events, _crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_event_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.scalars(1, {"train/loss": 2.5, "train/accuracy": 0.5})
    w.scalars(2, {"train/loss": 1.25})
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    rows = list(read_events(files[0]))
    assert rows[0][0] == 1 and abs(rows[0][1]["train/loss"] - 2.5) < 1e-6
    assert abs(rows[0][1]["train/accuracy"] - 0.5) < 1e-6
    assert rows[1] == (2, {"train/loss": 1.25})


def test_metrics_writer_emits_events(tmp_path):
    from lbt_tpu.utils.logging import MetricsWriter
    m = MetricsWriter(str(tmp_path))
    m.write(7, {"loss": 3.0}, prefix="train/")
    m.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert files
    rows = list(read_events(files[0]))
    assert rows == [(7, {"train/loss": 3.0})]


def test_metrics_writer_param_means(tmp_path):
    # per-layer W_mean/b_mean scalars (reference
    # dynamic_fixed_point.py:275-285)
    import numpy as np
    from lbt_tpu.utils.logging import MetricsWriter
    params = {"conv1": {"W": np.full((3, 3), 2.0, np.float32),
                        "b": np.zeros((4,), np.float32)},
              "fc": {"W": np.full((2, 2), -1.0, np.float32)}}
    m = MetricsWriter(str(tmp_path))
    m.write_param_means(5, params)
    m.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    rows = list(read_events(files[0]))
    assert rows and rows[0][0] == 5
    tags = rows[0][1]
    assert abs(tags["param/conv1/W_mean"] - 2.0) < 1e-6
    assert abs(tags["param/conv1/b_mean"]) < 1e-6
    assert abs(tags["param/fc/W_mean"] + 1.0) < 1e-6
