"""Gradient-quantization barrier.

The reference quantizes the backward cotangent at every conv/dense/BN layer
boundary inside a hand-written backward chain (reference models.py:47-51,
dynamic_fixed_point.py:299-305).  Here the same capability is a
``jax.custom_vjp`` *barrier*: identity in the forward pass, and in the
backward pass it (a) measures overflow statistics of the incoming float
cotangent and (b) quantizes it before it continues upstream.

Because backward-pass statistics cannot be returned as auxiliary outputs of
``jax.grad``, the barrier routes them through a *stat sink*: a zero-valued
``(2,)`` float32 argument whose cotangent is defined to be the overflow
rates.  Differentiating the loss w.r.t. the sinks pytree therefore yields
the per-site backward overflow statistics, purely functionally — this
replaces the reference's 'update_range' TF-collection side channel
(reference dynamic_fixed_point.py:40-41, trainer.py:63,157) for gradient
tensors.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes

from lbt_tpu.dfxp.quantize import overflow_stats, quantize, wrap_key

SINK_SHAPE = (2,)


def make_sink() -> jax.Array:
    """A fresh stat sink; its loss-cotangent carries [ovf, ovf2]."""
    return jnp.zeros(SINK_SHAPE, jnp.float32)


def _float0(x) -> np.ndarray:
    aval = jax.api_util.shaped_abstractify(x)
    return np.zeros(aval.shape, dtypes.float0)


# Sentinel stats that make update_exponent hold: ovf = 0 (no widen),
# ovf2 = 1 (no tighten).  Emitted on controller-gated-off steps.
HOLD_STATS = (0.0, 1.0)


@partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6, 7, 8, 9))
def _barrier(x, bits, exp, keydata, stochastic, noise_shared_axis0,
             noise_bits, backend, target, run_stats, sink):
    del exp, keydata, sink
    return x


def _barrier_fwd(x, bits, exp, keydata, stochastic, noise_shared_axis0,
                 noise_bits, backend, target, run_stats, sink):
    del sink
    return x, (exp, keydata)


def _barrier_bwd(bits, stochastic, noise_shared_axis0, noise_bits, backend,
                 target, run_stats, res, g):
    exp, keydata = res
    if run_stats:
        stats = overflow_stats(g, bits, exp, target)
    else:
        # controllers statically off this step (range_update_every
        # cadence): no reduction at all, exponent holds via the sentinel
        stats = jnp.array(HOLD_STATS, jnp.float32)
    key = None if keydata is None else wrap_key(keydata)
    gq = quantize(
        g, bits, exp, key,
        stochastic=stochastic, noise_shared_axis0=noise_shared_axis0,
        noise_bits=noise_bits, backend=backend,
    )
    key_cot = None if keydata is None else _float0(keydata)
    # cotangent dtype must match the forward input's (bf16 carriers):
    # on-grid values with <=9-bit codes are exact in bfloat16
    return (gq.astype(g.dtype), _float0(exp), key_cot, stats)


_barrier.defvjp(_barrier_fwd, _barrier_bwd)


def grad_quant_barrier(
    x: jax.Array,
    bits: int,
    exp: jax.Array,
    sink: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    stochastic: bool = False,
    noise_shared_axis0: bool = False,
    noise_bits: int = 24,
    backend: str = "xla",
    target_overflow_rate: float = 0.0,
    gate: bool = True,
) -> jax.Array:
    """Identity forward; backward quantizes the cotangent at ``(bits, exp)``
    and emits its overflow stats (:func:`overflow_stats` at
    ``target_overflow_rate``) as the cotangent of ``sink``.

    ``gate`` (static bool): when False the backward stat reduction is
    elided entirely and the sink cotangent is the hold sentinel
    (``HOLD_STATS``) — the controllers-off branch of
    ``QuantConfig.range_update_every`` (the cadence cond lives around
    the whole train step, train/step.py)."""
    if bits >= 32:
        return x
    keydata = None if key is None else jax.random.key_data(key)
    return _barrier(x, bits, exp, keydata, stochastic, noise_shared_axis0,
                    noise_bits, backend, target_overflow_rate, bool(gate),
                    sink)
