"""DFXP-int8 shared-exponent gradient all-reduce with error feedback.

Per parameter leaf, on each data-parallel shard:

1. ``total = local_grad + error_buffer``          (error feedback)
2. agree on a power-of-two scale: ``e = ceil(log2(pmax(|total|)))``
   (one tiny max all-reduce of the local maxima)
3. ``codes = round(total * 2**(7-e))`` clipped to int8 range
4. integer ``psum`` of the codes; dequantize and divide by shard count
5. the *local* quantization residual ``total - codes/mult`` becomes the
   next step's error buffer — exactly the GradientBuffer_q trick
   (reference dynamic_fixed_point.py:494-506) applied to the collective,
   which keeps low-bit gradient exchange unbiased over time.

Codes are transported as int32 in the psum for arithmetic safety (the
Pallas int8-wire ring collective is the bandwidth-optimal variant, see
lbt_tpu/ops/pallas).  Bits is configurable (default 8).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_error_buffers(params):
    return jax.tree.map(jnp.zeros_like, params)


def _leaf_allreduce(g, buf, axis_name: str, bits: int,
                    reduce: str = "sum"):
    total = g + buf
    local_max = jnp.max(jnp.abs(total))
    gmax = jax.lax.pmax(local_max, axis_name)
    # exact power-of-two exponent with 2**e > gmax (frexp is exact bit
    # manipulation: gmax = m * 2**e, m in [0.5, 1)); shared across shards
    e = jnp.frexp(jnp.maximum(gmax, 1e-30))[1].astype(jnp.int32)
    limit = float(2 ** (bits - 1))
    mult = jnp.ldexp(jnp.float32(1.0), (bits - 1) - e)
    codes = jnp.clip(jnp.round(total * mult), -(limit - 1), limit - 1)
    residual = total - codes / mult
    summed = jax.lax.psum(codes.astype(jnp.int32), axis_name)
    out = summed.astype(jnp.float32) / mult
    if reduce == "mean":
        out = out / jax.lax.psum(jnp.ones((), jnp.float32), axis_name)
    return out, residual


def lowbit_allreduce(grads, buffers, axis_name: str = "data",
                     bits: int = 8, reduce: str = "sum") -> Tuple:
    """Returns (reduced_grads, new_error_buffers).  ``reduce='sum'`` fits
    the 1/global-N loss scaling of the DP step; 'mean' averages."""
    out = jax.tree.map(
        lambda g, b: _leaf_allreduce(g, b, axis_name, bits, reduce),
        grads, buffers,
    )
    means = jax.tree.map(lambda t: t[0], out,
                         is_leaf=lambda t: isinstance(t, tuple))
    residuals = jax.tree.map(lambda t: t[1], out,
                             is_leaf=lambda t: isinstance(t, tuple))
    return means, residuals
