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

Transport:

* :func:`lowbit_allreduce` — XLA ``psum`` of the codes.  Codes travel as
  int16 when the exact sum fits (``num_shards`` given and
  ``2^(bits-1) * N < 2^15``), else int32.
* :func:`ring_lowbit_allreduce` — explicit bidirectional-agnostic ring
  (reduce-scatter + all-gather via ``lax.ppermute``) over ONE fused
  bucket of all leaves.  ``wire='int16'`` is bit-identical to the psum
  variant at half the wire bytes; ``wire='int8'`` widens every leaf's
  shared exponent by ``ceil(log2 N)`` so partial sums themselves fit
  int8 — the bandwidth-optimal 1 byte/element on both ring phases (4x
  vs f32), trading ``log2 N`` bits of per-shard resolution that the
  error feedback reabsorbs over time (cf. EQuARX, PAPERS.md).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def init_error_buffers(params):
    return jax.tree.map(jnp.zeros_like, params)


def _shared_exponent(total, axis_name: str, extra: int = 0):
    """Power-of-two scale agreed across shards: one tiny pmax all-reduce
    of the local max-abs, then exact frexp exponent (+``extra``)."""
    local_max = jnp.max(jnp.abs(total))
    gmax = lax.pmax(local_max, axis_name)
    e = jnp.frexp(jnp.maximum(gmax, 1e-30))[1].astype(jnp.int32) + extra
    return e


def _quantize_leaf(total, e, bits: int):
    limit = float(2 ** (bits - 1))
    mult = jnp.ldexp(jnp.float32(1.0), (bits - 1) - e)
    codes = jnp.clip(jnp.round(total * mult), -(limit - 1), limit - 1)
    residual = total - codes / mult
    return codes, mult, residual


def _leaf_allreduce(g, buf, axis_name: str, bits: int,
                    reduce: str = "sum",
                    num_shards: Optional[int] = None):
    total = g + buf
    e = _shared_exponent(total, axis_name)
    codes, mult, residual = _quantize_leaf(total, e, bits)
    wire_dt = jnp.int32
    if num_shards is not None and 2 ** (bits - 1) * num_shards < 2 ** 15:
        wire_dt = jnp.int16  # exact: |sum of codes| < 2^15
    summed = lax.psum(codes.astype(wire_dt), axis_name)
    out = summed.astype(jnp.float32) / mult
    if reduce == "mean":
        out = out / lax.psum(jnp.ones((), jnp.float32), axis_name)
    return out, residual


def lowbit_allreduce(grads, buffers, axis_name: str = "data",
                     bits: int = 8, reduce: str = "sum",
                     num_shards: Optional[int] = None) -> Tuple:
    """Returns (reduced_grads, new_error_buffers).  ``reduce='sum'`` fits
    the 1/global-N loss scaling of the DP step; 'mean' averages."""
    out = jax.tree.map(
        lambda g, b: _leaf_allreduce(g, b, axis_name, bits, reduce,
                                     num_shards),
        grads, buffers,
    )
    means = jax.tree.map(lambda t: t[0], out,
                         is_leaf=lambda t: isinstance(t, tuple))
    residuals = jax.tree.map(lambda t: t[1], out,
                             is_leaf=lambda t: isinstance(t, tuple))
    return means, residuals


# ---------------------------------------------------------------------------
# explicit ring: fused-bucket reduce-scatter + all-gather over ppermute
# ---------------------------------------------------------------------------


def _dyn_chunk(chunks, i):
    """chunks[(i % n)] with a traced index."""
    n = chunks.shape[0]
    return lax.dynamic_slice_in_dim(chunks, i % n, 1, axis=0)[0]


def ring_lowbit_allreduce(grads, buffers, axis_name: str,
                          num_shards: int, bits: int = 8,
                          wire: str = "int16",
                          reduce: str = "sum") -> Tuple:
    """Low-bit gradient all-reduce as an explicit ring collective.

    All leaves are quantized (per-leaf shared exponent, error feedback)
    and their integer codes concatenated into ONE flat bucket; the
    bucket is reduce-scattered around the ring (``num_shards - 1``
    ``ppermute`` hops), then the owned fully-reduced chunks are
    all-gathered (another ``num_shards - 1`` hops).  Every hop moves
    ``bucket / N`` elements of ``wire`` dtype — XLA lowers each hop onto
    ICI as a collective-permute, so wire bytes are exactly
    ``2 * (N-1)/N * bucket_size * sizeof(wire)``.

    ``wire='int16'``: partial sums are exact (requires
    ``2^(bits-1) * N < 2^15``); result is bit-identical to
    :func:`lowbit_allreduce`.  ``wire='int8'``: every leaf's exponent is
    widened by ``ceil(log2 N)`` so partial sums stay in int8 — 1
    byte/element wire at ``log2 N`` bits coarser per-shard resolution
    (absorbed by error feedback; requires ``bits <= 8``).
    """
    n = int(num_shards)
    if wire == "int8":
        assert bits <= 8, "int8 wire needs bits <= 8"
        wire_dt = jnp.int8
        extra = int(math.ceil(math.log2(n))) if n > 1 else 0
    elif wire == "int16":
        assert 2 ** (bits - 1) * n < 2 ** 15, \
            "int16 wire: exact partial sums need 2^(bits-1)*N < 2^15"
        wire_dt = jnp.int16
        extra = 0
    else:
        raise ValueError(f"unknown wire {wire!r}")

    leaves, treedef = jax.tree.flatten(grads)
    bufs = treedef.flatten_up_to(buffers)

    codes_list, mults, residuals = [], [], []
    for g, b in zip(leaves, bufs):
        total = g + b
        e = _shared_exponent(total, axis_name, extra=extra)
        codes, mult, residual = _quantize_leaf(total, e, bits)
        codes_list.append(codes.reshape(-1))
        mults.append(mult)
        residuals.append(residual)

    flat = jnp.concatenate(codes_list) if codes_list else jnp.zeros((0,))
    size = flat.shape[0]
    csize = -(-size // n)
    flat = jnp.pad(flat, (0, n * csize - size))
    chunks = flat.reshape(n, csize).astype(wire_dt)

    if n > 1:
        idx = lax.axis_index(axis_name)
        perm = [(j, (j + 1) % n) for j in range(n)]

        # reduce-scatter: after n-1 hops shard i owns chunk (i+1) % n
        send = _dyn_chunk(chunks, idx)
        for t in range(n - 1):
            recv = lax.ppermute(send, axis_name, perm)
            send = recv + _dyn_chunk(chunks, idx - 1 - t + n)

        # all-gather the owned chunks back into a full bucket
        out = jnp.zeros((n, csize), wire_dt)
        out = lax.dynamic_update_slice(
            out, send[None], ((idx + 1) % n, 0))
        cur = send
        for t in range(n - 1):
            cur = lax.ppermute(cur, axis_name, perm)
            out = lax.dynamic_update_slice(
                out, cur[None], ((idx - t + n) % n, 0))
        summed = out.reshape(-1)[:size].astype(jnp.float32)
    else:
        summed = flat[:size].astype(jnp.float32)

    scale = 1.0 / n if reduce == "mean" else 1.0
    outs = []
    off = 0
    for g, mult in zip(leaves, mults):
        k = g.size
        outs.append(summed[off:off + k].reshape(g.shape) / mult * scale)
        off += k
    return (jax.tree.unflatten(treedef, outs),
            jax.tree.unflatten(treedef, residuals))
