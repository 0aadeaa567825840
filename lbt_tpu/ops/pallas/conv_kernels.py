"""Fused int8 conv + DFXP epilogue (Pallas / Mosaic TPU).

The round-2 profile (benchmarks/BENCH_NOTES.md "Conv-pipe experiments")
showed the in-model "convolution fusions" averaging ~27 TOP/s against
~126 TOP/s for XLA's *isolated* int8 conv on the same shapes: the gap is
the elementwise baggage XLA fuses into the conv — dequant, stochastic
rounding noise, the next site's quantize, BN batch moments, controller
min/max — all over big f32 tensors.  De-fusing any of it was measured
slower twice (standalone Pallas quantize; 1x1-as-matmul).  This kernel
is the remaining attack: reproduce XLA's WHOLE fused pipeline inside one
Pallas kernel, hand-scheduled, so the MXU work and the VPU epilogue
overlap across grid steps instead of serializing inside one fusion.

One kernel invocation computes one output row h of the padded NHWC
convolution for the full batch:

    for dh in 0..2:  (three overlapping H blocks = three in_specs of the
                      same array, offset by one H row each)
      for dw in 0..2:
        acc[B, Wo, K] += dot(xq[B, dh, dw:dw+Wo, C], wq[dh*3+dw])
                         (int8 x int8 -> int32 on the MXU)
    y    = acc * inv_scale                          (f32, never in HBM)
    stats: min/max of y over the valid window       -> [2] per h
    yq   = floor(y * mult_out + U[0,1)) clipped     (hardware PRNG)
    moments: sum(yq), sum(yq^2) over (B, W)         -> [2, K] per h

i.e. the conv emits the NEXT site's int8 codes plus the BN-moment and
range-controller reductions directly; the only f32 full-size tensor of
the XLA pipeline (the conv output) never touches HBM.

Scope (the dominant ResNet 3x3 shape class): stride 1, SAME padding,
kh = kw = 3, Cin and Cout multiples of 128 (int8 lane width — ResNet-50
stages 2-4; stage 1's C=64 stays on XLA), input supplied as int8 codes
(the previous site's quantize output, which the int8 engine materializes
as a backward residual anyway).  Reference semantics covered: conv
(reference dynamic_fixed_point.py:291), stochastic rounding (:32-38),
BN input quantize + moments (:584-588), overflow controller measurement
(:48-67).

The stochastic noise here is the per-core hardware PRNG (seeded per
(seed, h) program), i.e. a different stream than the XLA paths' counter
hash — same policy as the other engine='pallas' kernels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV24 = float(2.0 ** -24)
_NEG = float(-3.0e38)
_POS = float(3.0e38)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _conv3x3_kernel(scal_ref, seed_ref, x0_ref, x1_ref, x2_ref, w_ref,
                    yq_ref, mom_ref,
                    *, w_valid: int, bits_out: int, stochastic: bool):
    """One (h, j) grid step: output row h, Cout tile j, all batches.

    x{0,1,2}_ref: [B, 1, Wp, C] int8 — input rows h, h+1, h+2 of the
    padded input.  w_ref: [9, C, TK] int8.  yq_ref: [B, 1, Wo, TK] int8
    codes out.  mom_ref: [1, 8, TK] f32 stats block — row 0 = sum yq,
    row 1 = sum yq^2 (over valid B,W), row 2 = min y (broadcast), row
    3 = max y, rows 4-7 unused (the 8-sublane minimum tile).
    """
    if stochastic:
        # Mosaic supports at most 2 seed words: fold (h, j) into one
        pltpu.prng_seed(seed_ref[0],
                        pl.program_id(0) * pl.num_programs(1)
                        + pl.program_id(1))
    wo = yq_ref.shape[2]

    acc = None
    for dh, xr in ((0, x0_ref), (1, x1_ref), (2, x2_ref)):
        row = xr[:, 0]                     # [B, Wp, C]
        for dw in range(3):
            xs = jax.lax.slice_in_dim(row, dw, dw + wo, axis=1)
            d = jax.lax.dot_general(
                xs, w_ref[dh * 3 + dw],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = d if acc is None else acc + d

    inv = scal_ref[0]
    mult = scal_ref[1]
    y = acc.astype(jnp.float32) * inv                 # [B, Wo, TK]

    # valid output columns are 0..w_valid-1; the rest convolve padding
    wmask = (jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
             < w_valid)
    mn = jnp.min(jnp.where(wmask, y, _POS))
    mx = jnp.max(jnp.where(wmask, y, _NEG))

    limit = float(2 ** (bits_out - 1))
    scaled = y * mult
    if stochastic:
        r = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
        u = pltpu.bitcast(r >> 8, jnp.int32).astype(jnp.float32) * _INV24
        q = jnp.floor(jnp.clip(scaled + u, -limit, limit - 1.0))
    else:
        q = jnp.round(jnp.clip(scaled, -limit, limit - 1.0))
    q = jnp.where(wmask, q, 0.0)
    yq_ref[:, 0] = q.astype(jnp.int8)
    tk = mom_ref.shape[2]
    # int8 codes of masked cols are 0 -> contribute nothing to moments
    mom_ref[0] = jnp.concatenate([
        jnp.sum(q, axis=(0, 1)).reshape(1, tk),
        jnp.sum(q * q, axis=(0, 1)).reshape(1, tk),
        jnp.full((1, tk), mn),
        jnp.full((1, tk), mx),
        jnp.zeros((4, tk), jnp.float32),
    ], axis=0)


def conv3x3_fused_int8(
    xq: jax.Array,
    wq: jax.Array,
    inv_scale: jax.Array,
    mult_out: jax.Array,
    seed: jax.Array,
    *,
    bits_out: int = 8,
    stochastic: bool = True,
    tile_k: int = 128,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused 3x3 stride-1 SAME conv + DFXP epilogue on int8 codes.

    Args:
      xq: [B, H, W, C] int8 input codes.
      wq: [3, 3, C, K] int8 weight codes.
      inv_scale: scalar f32 ``1/(mult_x * mult_w)`` (dequant).
      mult_out: scalar f32 quantization multiplier of the output site.
      seed: int32 scalar for the hardware PRNG.

    Returns ``(yq, moments, minmax)``:
      yq:      [B, H, W, K] int8 codes of the quantized conv output.
      moments: [2, K] f32 — sum(yq_code), sum(yq_code^2) over B,H,W
               (divide by B*H*W and scale by 1/mult_out outside to get
               the BN batch moments of the dequantized codes).
      minmax:  [2] f32 — global min/max of the UN-quantized conv output
               (the controller's overflow measurement input).
    """
    b, h, w, c = xq.shape
    assert wq.shape[:3] == (3, 3, c), wq.shape
    k = wq.shape[3]
    assert c % 128 == 0 and k % 128 == 0, (c, k)
    tk = min(tile_k, k)
    assert k % tk == 0
    k_tiles = k // tk

    wo = _round_up(w, 8)           # output cols incl. padding garbage
    wp = wo + 2                    # padded input width (dw reach)
    xpad = jnp.pad(xq, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    wflat = wq.reshape(9, c, k)

    scal = jnp.stack([inv_scale.astype(jnp.float32).reshape(()),
                      mult_out.astype(jnp.float32).reshape(())])
    seed_arr = seed.reshape(1).astype(jnp.int32)

    yq, mom = pl.pallas_call(
        functools.partial(
            _conv3x3_kernel, w_valid=w, bits_out=bits_out,
            stochastic=stochastic),
        grid=(h, k_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1, wp, c), lambda i, j: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, wp, c), lambda i, j: (0, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, wp, c), lambda i, j: (0, i + 2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, tk), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 1, wo, tk), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wo, k), jnp.int8),
            jax.ShapeDtypeStruct((h, 8, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wo * c * k * 9,
            bytes_accessed=3 * b * h * wp * c + b * h * wo * k + 9 * c * k,
            transcendentals=0,
        ),
    )(scal, seed_arr, xpad, xpad, xpad, wflat)

    moments = mom[:, :2].sum(axis=0)
    minmax = jnp.stack([mom[:, 2].min(), mom[:, 3].max()])
    return yq[:, :, :w, :], moments, minmax
