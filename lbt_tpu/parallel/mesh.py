"""Device mesh + sharding rules.

DP shards the batch over the ``data`` axis.  TP shards the *output
channel* dimension of large weights over the ``model`` axis (Dense
columns, conv Cout) — GSPMD then partitions the matmuls/convs and
inserts the reduce collectives.  For multi-host slices call
``jax.distributed.initialize()`` before ``make_mesh`` (mesh axes then
span all hosts; the ``data`` axis should ride DCN, ``model`` ICI).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 0, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data <= 0:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_spec() -> P:
    return P("data")


def shard_batch(mesh: Mesh, x) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P("data")))


# minimum size before a weight is worth sharding over 'model'
_TP_MIN_ELEMS = 32 * 1024


def param_pspecs(params, tp: bool = True) -> Dict:
    """PartitionSpec per params leaf: last (output-channel) dim sharded
    over 'model' for large kernels, everything else replicated."""

    def spec(path, leaf):
        name = getattr(path[-1], "key", "") if path else ""
        if (tp and name == "W" and leaf.ndim >= 2
                and leaf.size >= _TP_MIN_ELEMS):
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def to_shardings(mesh: Mesh, pspecs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda s: isinstance(s, P),
    )
