"""Multi-host entry points.

A multi-host TPU slice runs one process per host; JAX needs a rendezvous
before any backend use (SURVEY.md §5.8).  Typical launch:

    # on every host, same command:
    python -c "import lbt_tpu.parallel.multihost as mh; mh.initialize()" \
        && python main.py ...

or call :func:`initialize` first thing in your driver.  After that,
``jax.devices()`` spans the slice, ``make_mesh`` builds a global mesh
(lay the ``data`` axis across hosts so the gradient all-reduce rides
DCN once per step while ``model``-axis collectives stay on ICI), and
each host feeds only its own shard of the batch
(:func:`host_batch_slice`).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID; TPU pod slices
    usually auto-detect all three)."""
    kw = {}
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
    n = num_processes or os.environ.get("NUM_PROCESSES")
    if n:
        kw["num_processes"] = int(n)
    p = process_id if process_id is not None else os.environ.get("PROCESS_ID")
    if p is not None:
        kw["process_id"] = int(p)
    jax.distributed.initialize(**kw)


def host_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of the global batch (batch is
    sharded over all devices; each host feeds its local devices)."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    per = global_batch // n_proc
    return jax.process_index() * per, per


def globalize_batches(iterator, sharding):
    """Turn an iterator of identical host-side GLOBAL (x, y) batches into
    global device arrays sharded over the mesh 'data' axis.

    Each process keeps only its :func:`host_batch_slice` rows and builds
    the cross-process array with
    ``jax.make_array_from_process_local_data`` — the multi-controller
    feed contract (every process sees the same global batch because the
    batch iterators are seeded identically; the slice assignment matches
    the 'data'-major device order of parallel/mesh.make_mesh).  Works
    unchanged (and degenerates to a sharded device_put) in a
    single-process run.
    """
    for x, y in iterator:
        start, size = host_batch_slice(x.shape[0])
        xg = jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(x[start:start + size]))
        yg = jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(y[start:start + size]))
        yield xg, yg
