"""Host batching with background device prefetch.

The reference round-trips every batch through the host twice per step
(fetch with one Session.run, re-feed with feed_dict; reference
trainer.py:146,153-157, defeating its own tf.data prefetch).  Here the
host thread slices shuffled numpy arrays and enqueues device transfers
one step ahead so the TPU never waits on PCIe.
"""

from __future__ import annotations

import collections
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


def batch_iterator(
    x: np.ndarray,
    y: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_remainder: bool = True,
    seed: int = 0,
    epoch: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Shuffled minibatches (numpy views).  ``drop_remainder`` keeps
    shapes static for jit."""
    n = len(x)
    idx = np.arange(n)
    if shuffle:
        rng = np.random.default_rng((seed << 20) ^ epoch)
        rng.shuffle(idx)
    end = n - (n % batch_size) if drop_remainder else n
    for start in range(0, end, batch_size):
        sel = idx[start:start + batch_size]
        yield x[sel], y[sel]


def device_prefetch(iterator, size: int = 2, device=None,
                    threaded: bool = True):
    """Move batches to device ``size`` steps ahead of consumption.

    ``threaded=True`` (default): a producer thread pulls from
    ``iterator`` (host batch prep — native-loader decode, numpy
    slicing) and issues the async ``device_put``, so host prep AND the
    host->device transfer both overlap the compiled step running on
    device.  The unthreaded path still overlaps the (async) device_put
    but blocks the consumer on host prep — double-buffering in depth
    only, not in host work.  Order is preserved either way; producer
    exceptions re-raise at the consumer."""
    if not threaded:
        queue = collections.deque()

        def enqueue(n):
            for _ in range(n):
                try:
                    batch = next(iterator)
                except StopIteration:
                    return
                queue.append(jax.device_put(batch, device))

        enqueue(size)
        while queue:
            yield queue.popleft()
            enqueue(1)
        return

    import queue as _q
    q: "_q.Queue" = _q.Queue(maxsize=size)
    _END, _ERR = object(), object()
    stop = threading.Event()

    def _put(item) -> bool:
        # Bounded put that aborts when the consumer is gone, so an
        # abandoned generator (exception in the train step, early
        # break) can't leave this thread blocked forever holding
        # ~size+2 device-resident batches and the loader's resources.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _q.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                if not _put(jax.device_put(batch, device)):
                    return
        except BaseException as e:  # noqa: BLE001 - re-raised below
            _put((_ERR, e))
            return
        _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, tuple) and len(item) == 2 \
                    and item[0] is _ERR:
                raise item[1]
            yield item
    finally:
        # Consumer done or abandoned (GeneratorExit lands here): stop
        # the producer and drain so any in-flight put unblocks and the
        # device buffers are released promptly.
        stop.set()
        try:
            while True:
                q.get_nowait()
        except _q.Empty:
            pass
