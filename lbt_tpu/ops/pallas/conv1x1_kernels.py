"""Fused int8 1x1-conv + DFXP epilogue as a Pallas TPU matmul kernel.

Round-4 successor to the 3x3 attempt (conv_kernels.py, recorded
negative): the steady-state fusion audit (benchmarks/fusion_audit.py,
BENCH_NOTES round 4) shows the stage-1 1x1 conv+quantize+moments
fusions running at ~220 GB/s — XLA lowers them through the
batch-in-sublanes conv emitters (EmitAllInputFeatureInSublanes...,
input layout {0,3,2,1}) — while the unit's minimal HBM traffic
(s8 in + s8 codes out) would take ~0.2 ms at the 700 GB/s the
neighboring loop fusions reach.  A 1x1 conv over NHWC is exactly a
[B*H*W, Cin] @ [Cin, Cout] matmul on the int8 codes, so unlike the 3x3
case the hand kernel needs no overlapping row blocks: one M-tile per
grid step, weights resident in VMEM, epilogue (dequant, controller
min/max, stochastic quantize to the next site's codes, BN moments of
the codes) fused after the dot.  The f32 conv output never touches HBM.

Epilogue semantics match the XLA unit (and the 3x3 kernel): reference
conv forward dynamic_fixed_point.py:291, stochastic rounding :32-38,
BN input quantize + moments :584-588, controller measurement :48-67.
Stochastic noise uses the per-core hardware PRNG (different stream than
the XLA counter hash, same policy as the other engine='pallas' kernels).
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


def _conv1x1_kernel(scal_ref, seed_ref, x_ref, w_ref, yq_ref, mom_ref,
                    *, m_valid: int, bits_out: int, stochastic: bool):
    """One grid step: M-tile i of the flattened [M, Cin] codes.

    x_ref: [TM, Cin] s8.  w_ref: [Cin, K] s8 (resident).  yq_ref:
    [TM, K] s8 codes out.  mom_ref: [8, K] f32 accumulator block
    (constant index map — revisited every step): row 0 = sum(codes),
    row 1 = sum(codes^2) over valid rows, row 2 = running min(y) per
    lane, row 3 = running max(y), rows 4-7 pad to the 8-sublane tile.
    """
    i = pl.program_id(0)
    tm = x_ref.shape[0]
    k = w_ref.shape[1]
    if stochastic:
        pltpu.prng_seed(seed_ref[0], i)

    inv_scale = scal_ref[0]
    mult_out = scal_ref[1]
    limit = float(2 ** (bits_out - 1))

    acc = jnp.dot(x_ref[...], w_ref[...],
                  preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * inv_scale

    # valid-row mask for the padded tail tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + i * tm
    valid = rows < m_valid

    if stochastic:
        # bitcast to uint32 before the shift: prng_random_bits returns
        # signed int32 and an arithmetic >>8 would leave u in [-0.5,0.5)
        # (a -0.5 LSB bias); the logical shift keeps u in [0,1).
        r = pltpu.bitcast(pltpu.prng_random_bits((tm, k)), jnp.uint32)
        u = pltpu.bitcast(r >> 8, jnp.int32).astype(jnp.float32) * _INV24
        q = jnp.floor(jnp.clip(y * mult_out + u, -limit, limit - 1.0))
    else:
        # round(clip(.)) with -limit rail: codes saturate at -2^(b-1),
        # matching quantize_int (dfxp/quantize.py) and the 3x3 kernel.
        q = jnp.round(jnp.clip(y * mult_out, -limit, limit - 1.0))
    q = jnp.where(valid, q, 0.0)
    yq_ref[...] = q.astype(jnp.int8)

    y_min = jnp.min(jnp.where(valid, y, _POS), axis=0)
    y_max = jnp.max(jnp.where(valid, y, _NEG), axis=0)

    @pl.when(i == 0)
    def _():
        mom_ref[...] = jnp.zeros_like(mom_ref)
        mom_ref[2, :] = jnp.full((k,), _POS, jnp.float32)
        mom_ref[3, :] = jnp.full((k,), _NEG, jnp.float32)

    mom_ref[0, :] += q.sum(axis=0)
    mom_ref[1, :] += (q * q).sum(axis=0)
    mom_ref[2, :] = jnp.minimum(mom_ref[2, :], y_min)
    mom_ref[3, :] = jnp.maximum(mom_ref[3, :], y_max)


def conv1x1_fused_int8(
    xq: jax.Array,
    wq: jax.Array,
    inv_scale: jax.Array,
    mult_out: jax.Array,
    seed: jax.Array,
    *,
    bits_out: int = 8,
    stochastic: bool = True,
    tile_m: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused 1x1 stride-1 conv + DFXP epilogue on int8 codes.

    Args:
      xq: [B, H, W, C] int8 input codes.
      wq: [C, K] (or [1, 1, C, K]) int8 weight codes.
      inv_scale / mult_out / seed: as conv3x3_fused_int8.

    Returns ``(yq, moments, minmax)`` with the same contract as
    conv3x3_fused_int8: yq [B, H, W, K] int8 codes; moments [2, K]
    (sum codes, sum codes^2 over B,H,W); minmax [2] f32 of the
    dequantized conv output.
    """
    b, h, w, c = xq.shape
    wq = wq.reshape(wq.shape[-2], wq.shape[-1])
    assert wq.shape[0] == c, (wq.shape, c)
    k = wq.shape[1]

    m = b * h * w
    if tile_m <= 0:
        # Largest VMEM-fitting M tile: the f32 intermediates (acc, y,
        # noise, codes) cost ~16 B per (row, K) element, so cap
        # tile_m * k at 2^21 elements (~32 MB of f32 working set; the
        # TPU-measured sweep put tile_m=8192 at k=256 1.3x faster than
        # 1024-2048, and 16384 over the VMEM budget).
        tile_m = max(1024, (1 << 21) // max(k, 1))
    tm = min(tile_m, _round_up(m, 8))
    mp = _round_up(m, tm)
    xf = xq.reshape(m, c)
    if mp != m:
        xf = jnp.pad(xf, ((0, mp - m), (0, 0)))

    scal = jnp.stack([inv_scale.astype(jnp.float32).reshape(()),
                      mult_out.astype(jnp.float32).reshape(())])
    seed_arr = seed.reshape(1).astype(jnp.int32)

    yq, mom = pl.pallas_call(
        functools.partial(
            _conv1x1_kernel, m_valid=m, bits_out=bits_out,
            stochastic=stochastic),
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((8, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * c * k,
            bytes_accessed=mp * c + mp * k + c * k,
            transcendentals=0,
        ),
    )(scal, seed_arr, xf, wq)

    moments = mom[:2]
    minmax = jnp.stack([mom[2].min(), mom[3].max()])
    return yq[:m].reshape(b, h, w, k), moments, minmax
