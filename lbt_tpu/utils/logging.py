"""Experiment logging.

The reference logs via Python logging (stderr + experiment.log, reference
main.py:24-44) and TensorBoard scalars for loss/accuracy and every
quantizer range variable (reference dynamic_fixed_point.py:275-285,
trainer.py:66,72-73).  Here: same Python logger, plus a JSONL metrics
stream (one line per event — trivially machine-readable) that includes
per-tensor exponent trajectories, with optional TensorBoard mirroring
when TF is importable.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def _path_entry_str(p) -> str:
    """Clean tag for one pytree path entry: ``DictKey('conv1')`` ->
    ``conv1``, ``SequenceKey(idx=0)`` -> ``0``, ``GetAttrKey('w')`` ->
    ``w`` — so non-dict params pytrees don't produce repr-style tags."""
    for attr in ("key", "idx", "name"):
        if hasattr(p, attr):
            return str(getattr(p, attr))
    return str(p)


def get_logger(path: Optional[str] = None,
               name: str = "lbt_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(fmt)
    logger.addHandler(h)
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fh = logging.FileHandler(path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def _to_scalar(v):
    if isinstance(v, (jax.Array, np.ndarray)):
        return float(np.asarray(v))
    return v


class MetricsWriter:
    """JSONL metrics writer + TensorBoard mirror (dependency-free event
    files via lbt_tpu.utils.tb, mirroring the reference's scalar
    summaries, reference trainer.py:66-73)."""

    def __init__(self, logdir: Optional[str], tensorboard: bool = True):
        self._f = None
        self._tb = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self._f = open(os.path.join(logdir, "metrics.jsonl"), "a")
            if tensorboard:
                from lbt_tpu.utils.tb import EventWriter
                self._tb = EventWriter(logdir)

    def write(self, step: int, metrics: Dict[str, Any], prefix: str = ""):
        if self._f is None:
            return
        row = {("%s%s" % (prefix, k)): _to_scalar(v)
               for k, v in metrics.items()}
        row["step"] = int(step)
        row["time"] = time.time()
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.scalars(step, {
                k: v for k, v in row.items()
                if k not in ("step", "time") and isinstance(v, (int, float))
            })

    def write_exponents(self, step: int, qstate, prefix: str = "exp/"):
        """Per-tensor exponent trajectories (the reference's *_range
        TensorBoard scalars, dynamic_fixed_point.py:275-285)."""
        if self._f is None:
            return
        flat = jax.tree_util.tree_flatten_with_path(qstate)[0]
        row = {}
        for path, leaf in flat:
            keys = [getattr(p, "key", str(p)) for p in path]
            if "exp" in keys:
                row[prefix + "/".join(keys)] = _to_scalar(leaf)
        if row:
            self.write(step, row)

    def write_param_means(self, step: int, params, prefix: str = "param/"):
        """Per-tensor parameter means (the reference's ``W_mean`` /
        ``b_mean`` / ``g_mean`` TensorBoard scalars, logged per layer
        every summary step — reference dynamic_fixed_point.py:275-285).
        One fused jitted reduction over the whole params pytree, fetched
        once; tags are ``param/<layer>/<tensor>_mean``."""
        if self._f is None:
            return
        if not hasattr(self, "_mean_fn"):
            self._mean_fn = jax.jit(lambda p: jax.tree_util.tree_map(
                lambda a: a.astype("float32").mean(), p))
        means = jax.device_get(self._mean_fn(params))
        row = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(means)[0]:
            keys = [_path_entry_str(p) for p in path]
            row[prefix + "/".join(keys) + "_mean"] = float(leaf)
        if row:
            self.write(step, row)

    def close(self):
        if self._f:
            self._f.close()
        if self._tb:
            self._tb.close()
