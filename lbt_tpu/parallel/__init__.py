"""Mesh parallelism: DP/TP sharding + low-bit gradient all-reduce.

The reference is strictly single-device (SURVEY.md §2.4: no DP/TP/PP, no
comm backend of any kind); this subsystem is new capability, built the
TPU way: a ``jax.sharding.Mesh`` with a ``data`` axis (batch parallelism)
and a ``model`` axis (tensor-sharded weights), XLA-inserted collectives
over ICI, and an optional DFXP-int8 shared-exponent gradient all-reduce
with GradientBuffer-style error feedback (reference
dynamic_fixed_point.py:494-506 semantics, distributed)."""

from lbt_tpu.parallel.mesh import (  # noqa: F401
    batch_spec,
    make_mesh,
    param_pspecs,
    shard_batch,
)
from lbt_tpu.parallel.dp import make_dp_train_step  # noqa: F401
from lbt_tpu.parallel.lowbit import (  # noqa: F401
    init_error_buffers,
    lowbit_allreduce,
)
