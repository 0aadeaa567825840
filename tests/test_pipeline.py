"""Host pipeline: batching + threaded device prefetch."""

import numpy as np
import pytest

from lbt_tpu.data.pipeline import batch_iterator, device_prefetch


def _batches(n=10):
    for i in range(n):
        yield (np.full((4, 3), i, np.float32), np.full((4,), i, np.int32))


@pytest.mark.parametrize("threaded", [False, True])
def test_device_prefetch_order_and_content(threaded):
    out = list(device_prefetch(_batches(), threaded=threaded))
    assert len(out) == 10
    for i, (x, y) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(x), i)
        np.testing.assert_array_equal(np.asarray(y), i)


def test_device_prefetch_threaded_propagates_errors():
    def bad():
        yield (np.zeros((2, 2), np.float32), np.zeros((2,), np.int32))
        raise RuntimeError("loader broke")

    it = device_prefetch(bad(), threaded=True)
    next(it)
    with pytest.raises(RuntimeError, match="loader broke"):
        list(it)


def test_batch_iterator_shuffles_per_epoch_deterministically():
    x = np.arange(32, dtype=np.float32).reshape(32, 1)
    y = np.arange(32, dtype=np.int32)
    a = [b[1].tolist() for b in batch_iterator(x, y, 8, seed=3, epoch=0)]
    b = [b[1].tolist() for b in batch_iterator(x, y, 8, seed=3, epoch=0)]
    c = [b[1].tolist() for b in batch_iterator(x, y, 8, seed=3, epoch=1)]
    assert a == b
    assert a != c
    assert sorted(sum(a, [])) == list(range(32))


def test_device_prefetch_threaded_releases_producer_on_abandon():
    """An abandoned generator (early break) must not leave the producer
    thread blocked on a full queue holding device buffers (advisor
    round 3)."""
    import threading
    import time

    produced = []

    def src():
        for i in range(100):
            produced.append(i)
            yield (np.full((2,), i, np.float32), np.full((2,), i, np.int32))

    it = device_prefetch(src(), size=2, threaded=True)
    next(it)
    it.close()  # GeneratorExit -> finally: stop + drain
    n_threads_deadline = time.time() + 5.0
    while time.time() < n_threads_deadline:
        alive = [t for t in threading.enumerate()
                 if t.daemon and t.is_alive() and "Thread-" in t.name]
        time.sleep(0.05)
        before = len(produced)
        time.sleep(0.3)
        if len(produced) == before:
            break
    # producer stopped pulling well short of the 100-item source
    assert len(produced) < 100
