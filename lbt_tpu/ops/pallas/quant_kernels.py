"""Fused DFXP quantization kernels (Pallas / Mosaic TPU).

Design notes (see pallas_guide.md):

* the power-of-two multiplier ``2**(bits-1-exp)`` is computed *outside*
  the kernel with ``jnp.ldexp`` (exact) and passed as an SMEM scalar —
  in-kernel ``exp2`` is a VPU polynomial and not guaranteed exact;
* stochastic rounding uses the per-core hardware PRNG
  (``pltpu.prng_seed`` / ``prng_random_bits``): uniform [0,1) noise is
  built from the top 24 bits of a uint32, ``u = (r >> 8) * 2**-24``,
  an order of magnitude cheaper than XLA's threefry;
* int8 tiles obey the (32, 128) minimum tile rule; all shapes are padded
  to (128, 128) multiples by the wrappers (zeros quantize to zero and
  contribute nothing to the matmul).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbt_tpu.dfxp.quantize import multiplier

_INV24 = float(2.0 ** -24)


def _uniform01(shape):
    r = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 24 bits -> [0, 2**24); route through int32 (Mosaic has no
    # uint32->f32 cast); values < 2**24 so the sign bit is never set
    r24 = pltpu.bitcast(r >> 8, jnp.int32)
    return r24.astype(jnp.float32) * _INV24


def _quantize_block(x, mult, limit, stochastic):
    scaled = x * mult
    if stochastic:
        scaled = scaled + _uniform01(scaled.shape)
        return jnp.floor(jnp.clip(scaled, -limit, limit - 1.0))
    return jnp.round(jnp.clip(scaled, -limit, limit - 1.0))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# standalone fused quantize -> int8 codes
# ---------------------------------------------------------------------------


def _quant_kernel(mult_ref, seed_ref, x_ref, out_ref, *, bits, stochastic):
    if stochastic:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    limit = float(2 ** (bits - 1))
    codes = _quantize_block(x_ref[:], mult_ref[0], limit, stochastic)
    out_ref[:] = codes.astype(out_ref.dtype)


def _view2d(shape) -> Optional[Tuple[int, int]]:
    """(rows, cols) for a layout-preserving 2-d view with lane-aligned
    cols (row-major: any suffix of dims collapses for free), or None."""
    cols = 1
    dims = list(shape)
    while dims:
        cols *= dims.pop()
        if cols % 128 == 0 and cols <= 4096:
            rows = 1
            for d in dims:
                rows *= d
            return rows, cols
        if cols > 4096:
            return None
    return None


def quantize_pallas(
    x: jax.Array,
    bits: int,
    exp: jax.Array,
    seed: Optional[jax.Array] = None,
    *,
    stochastic: bool = False,
    block_rows: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """Fused DFXP quantize of an arbitrary-shape f32 tensor.

    Returns ``(codes, mult)`` with codes int8 when ``bits <= 8`` else
    int32, ``dequantized = codes / mult``.  Stochastic rounding uses the
    in-kernel hardware PRNG — no threefry arithmetic, which dominates
    XLA-side stochastic quantization (benchmarks/BENCH_NOTES.md).

    When a trailing suffix of dims collapses to a 128-multiple (e.g. the
    W*C of an NHWC activation), the 2-d view is free (row-major); other
    shapes pay one pad/flatten copy.
    """
    assert bits < 32
    orig_shape = x.shape
    n = x.size

    view = _view2d(orig_shape)
    if view is not None:
        rows, cols = view
        xf = x.reshape(rows, cols)
        pad_rows = _round_up(rows, 8) - rows
        if pad_rows:
            xf = jnp.pad(xf, ((0, pad_rows), (0, 0)))
        rows += pad_rows
    else:
        cols = 512
        rows = _round_up(-(-n // cols), 8)
        xf = jnp.pad(x.reshape(-1), (0, rows * cols - n)).reshape(
            rows, cols)

    mult = multiplier(bits, exp).reshape(1)
    seed_arr = (jnp.zeros((1,), jnp.int32) if seed is None
                else seed.reshape(1).astype(jnp.int32))
    out_dtype = jnp.int8 if bits <= 8 else jnp.int32

    br = min(block_rows, rows)
    codes = pl.pallas_call(
        functools.partial(_quant_kernel, bits=bits, stochastic=stochastic),
        grid=(pl.cdiv(rows, br),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(mult, seed_arr, xf)
    if view is not None:
        out = codes[:view[0]] if pad_rows else codes
        return out.reshape(orig_shape), multiplier(bits, exp)
    return (codes.reshape(-1)[:n].reshape(orig_shape),
            multiplier(bits, exp))


# ---------------------------------------------------------------------------
# fused quantize(x) @ quantize(w) int8 matmul with dequant
# ---------------------------------------------------------------------------


def _mm_int8_kernel(inv_ref, x_ref, w_ref, o_ref, acc_ref, *, k_tiles):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == k_tiles - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * inv_ref[0]


def matmul_int8_pallas(xq: jax.Array, wq: jax.Array, inv_scale: jax.Array,
                       *, tm: int = 512, tk: int = 512,
                       tn: int = 512) -> jax.Array:
    """int8 x int8 -> int32 MXU matmul with the dequant fused into the
    final K step.  Operands are int8 codes; ``inv_scale`` is the scalar
    ``1 / (mult_x * mult_w)``."""
    m, kdim = xq.shape
    k2, n = wq.shape
    assert kdim == k2
    tm, tk, tn = min(tm, _round_up(m, 128)), min(tk, _round_up(kdim, 128)), \
        min(tn, _round_up(n, 128))
    mp, kp, np_ = _round_up(m, tm), _round_up(kdim, tk), _round_up(n, tn)
    xp = jnp.pad(xq, ((0, mp - m), (0, kp - kdim)))
    wp = jnp.pad(wq, ((0, kp - kdim), (0, np_ - n)))
    k_tiles = kp // tk

    out = pl.pallas_call(
        functools.partial(_mm_int8_kernel, k_tiles=k_tiles),
        grid=(mp // tm, np_ // tn, k_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
    )(inv_scale.reshape(1), xp, wp)
    return out[:m, :n]


def qmatmul_pallas(
    x: jax.Array,
    w: jax.Array,
    exp_x: jax.Array,
    exp_w: jax.Array,
    *,
    bits_x: int,
    bits_w: int,
    seed: Optional[jax.Array] = None,
    stochastic: bool = False,
    tm: int = 512,
    tk: int = 512,
    tn: int = 512,
) -> jax.Array:
    """Fused DFXP matmul on int8 codes.

    v2 (see benchmarks/BENCH_NOTES.md): v1 quantized each x tile once
    per N block and each w tile once per M block *inside* the matmul
    grid, streaming the f32 operands from HBM on every visit — the
    redundant VPU quantize work plus 4-byte operand traffic made it
    2.4x slower than XLA's int8 dot.  v2 quantizes each operand exactly
    once in a bandwidth-bound pass (hardware-PRNG stochastic rounding),
    materializes the int8 codes (1 byte/elem, the matmul's steady-state
    traffic), and runs a clean int8 MXU kernel with 512-tiles and the
    dequant fused into the final K step.
    """
    assert bits_x <= 8 and bits_w <= 8
    seed_x = seed_w = None
    if stochastic and seed is not None:
        seed_x = seed.reshape(()).astype(jnp.int32)
        seed_w = seed_x ^ jnp.int32(0x9E37)
    xq, mx = quantize_pallas(x, bits_x, exp_x, seed_x,
                             stochastic=stochastic)
    wq, mw = quantize_pallas(w, bits_w, exp_w, seed_w,
                             stochastic=stochastic)
    inv = 1.0 / (mx * mw)
    return matmul_int8_pallas(xq, wq, inv, tm=tm, tk=tk, tn=tn)
