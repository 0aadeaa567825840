"""Fused quantized matmul / conv2d with integer compute.

The reference simulates quantization by fake-quantizing (quantize ->
dequantize) in float32 around stock float ops (reference
dynamic_fixed_point.py:287-291, :384-388).  On TPU we instead run the MXU
on the *integer codes* directly:

* both operands' codes fit in int8  -> int8 x int8 -> int32 MXU matmul
  (exact accumulation, 2x bf16 throughput on v5e);
* codes fit in 9 bits (DFXP conv activations are bits+1 wide) -> bf16 x
  bf16 -> f32: integers with magnitude <= 2**8 are exact in bfloat16 and
  products (< 2**16) accumulate exactly in the f32 accumulator;
* wider                             -> f32 fake-quant fallback.

The result is dequantized by the product of the two power-of-two
multipliers, so for <=9-bit schemes the integer path is bit-identical to
the reference's float simulation — verified in tests/test_qops.py.

Backward follows the reference contract (dynamic_fixed_point.py:299-305):
the incoming cotangent has already been quantized by the layer's
``grad_quant_barrier``; here we only recover its integer codes (exact:
it lies on the ``exp_g`` grid) and run the two backward contractions in
integer form as well:

    dx = gq @ Wq^T       dW = Xq^T @ gq        (dense)
    dx = conv_T(gq, Wq)  dW = conv(Xq, gq)     (conv, via dilated convs)

STE means d/dx passes straight through the operand quantizers.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes, lax

# Round-4 fusion-isolation probe (BENCH_NOTES "HLO emitter audit"): the
# in-model conv fusions run at ~330-400 GB/s while neighboring loop
# fusions hit 560-730 — hypothesis: the VPU epilogue/prologue chains XLA
# fuses into the conv ops serialize with the MXU phase.  Setting
# LBT_CONV_BARRIER to a comma set of {fwd_in, fwd_out, bwd_in, bwd_out}
# wraps the corresponding conv operands/results in optimization_barrier
# so the conv lowers as a standalone fusion and the elementwise work
# becomes separate (roofline-speed) loop fusions, at the cost of
# materializing the barrier tensors through HBM.  Measurement knob only;
# numerically inert.
_CONV_BARRIER = frozenset(
    t for t in os.environ.get("LBT_CONV_BARRIER", "").split(",") if t)


def _maybe_barrier(x, tag: str):
    return lax.optimization_barrier(x) if tag in _CONV_BARRIER else x


def _barrier_out(y, tag: str):
    """Output-side barrier.  ``<tag>16`` additionally materializes the
    boundary at bf16 (2 B/elem instead of f32's 4) — PROBE ONLY: raw
    integer conv accumulations exceed bf16's 8-bit mantissa, so this
    perturbs the cotangent at ~0.4% relative, comparable to the 8-bit
    re-quantization it immediately feeds, but NOT numerically inert."""
    if tag + "16" in _CONV_BARRIER:
        return lax.optimization_barrier(
            y.astype(jnp.bfloat16)).astype(jnp.float32)
    return _maybe_barrier(y, tag)

from lbt_tpu.dfxp.quantize import (
    multiplier, quantize_int, quantize_ste, wrap_key)

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_DUMMY_KEY = np.zeros((2,), np.uint32)


def _float0(x) -> np.ndarray:
    aval = jax.api_util.shaped_abstractify(x)
    return np.zeros(aval.shape, dtypes.float0)


def _code_dtype(*bits: int):
    """(operand_dtype, accumulator_dtype) for exact integer-code compute,
    or None when the widths are too wide for an exact fast path."""
    m = max(bits)
    if m <= 8:
        return jnp.int8, jnp.int32
    if m <= 9:
        return jnp.bfloat16, jnp.float32
    return None


def _codes(x, bits, exp, keydata, stochastic, shared, noise_bits=24,
           backend="xla"):
    key = wrap_key(keydata) if stochastic else None
    return quantize_int(
        x, bits, exp, key, stochastic=stochastic,
        noise_shared_axis0=shared, noise_bits=noise_bits, backend=backend,
    )


def _recover_codes(gq, mult):
    """Integer codes of a tensor already on the (bits, exp) grid."""
    return jnp.round(gq.astype(jnp.float32) * mult)


def _keydata(key) -> jax.Array:
    return _DUMMY_KEY if key is None else jax.random.key_data(key)


# ---------------------------------------------------------------------------
# quantized matmul
# ---------------------------------------------------------------------------


def _dot(a, b, dims, op_dt, acc_dt):
    return lax.dot_general(
        a.astype(op_dt), b.astype(op_dt), dims,
        preferred_element_type=acc_dt,
    ).astype(jnp.float32)


_MM = (((1,), (0,)), ((), ()))          # [m,k] @ [k,n]
_MM_GT = (((1,), (1,)), ((), ()))       # g @ w^T : [m,n],[k,n] -> [m,k]
_MM_XG = (((0,), (0,)), ((), ()))       # x^T @ g : [m,k],[m,n] -> [k,n]

_QMM_STATIC = (2, 3, 4, 5, 6, 7, 8, 9)  # bits_*, stoch, shared, gog, noise_bits, backend


@partial(jax.custom_vjp, nondiff_argnums=_QMM_STATIC)
def _qmatmul_int(
    x, w, bits_x, bits_w, bits_g, stochastic, shared, grad_on_grid,
    noise_bits, backend, exp_x, exp_w, exp_g, kx, kw,
):
    y, _ = _qmatmul_fwd(
        x, w, bits_x, bits_w, bits_g, stochastic, shared, grad_on_grid,
        noise_bits, backend, exp_x, exp_w, exp_g, kx, kw,
    )
    return y


def _qmatmul_fwd(
    x, w, bits_x, bits_w, bits_g, stochastic, shared, grad_on_grid,
    noise_bits, backend, exp_x, exp_w, exp_g, kx, kw,
):
    xc, mx = _codes(x, bits_x, exp_x, kx, stochastic, shared, noise_bits,
                    backend)
    wc, mw = _codes(w, bits_w, exp_w, kw, stochastic, shared, noise_bits,
                    backend)
    op_dt, acc_dt = _code_dtype(bits_x, bits_w)
    y = _dot(xc, wc, _MM, op_dt, acc_dt) / (mx * mw)
    return y, (xc, wc, mx, mw, exp_g)


def _qmatmul_bwd(
    bits_x, bits_w, bits_g, stochastic, shared, grad_on_grid, noise_bits,
    backend, res, g,
):
    xc, wc, mx, mw, exp_g = res
    if grad_on_grid:
        # cotangent is on the (bits_g, exp_g) grid: integer backward.
        mg = multiplier(bits_g, exp_g)
        gc = _recover_codes(g, mg)
        op_dt, acc_dt = _code_dtype(bits_g, bits_w)
        dx = _dot(gc, wc, _MM_GT, op_dt, acc_dt) / (mg * mw)
        op_dt, acc_dt = _code_dtype(bits_x, bits_g)
        dw = _dot(xc, gc, _MM_XG, op_dt, acc_dt) / (mx * mg)
    else:
        wq = wc.astype(jnp.float32) / mw
        xq = xc.astype(jnp.float32) / mx
        dx = lax.dot_general(g, wq, _MM_GT, preferred_element_type=jnp.float32)
        dw = lax.dot_general(xq, g, _MM_XG, preferred_element_type=jnp.float32)
    z = _float0(exp_g)
    k0 = np.zeros((2,), dtypes.float0)
    return (dx, dw, z, z, z, k0, k0)


_qmatmul_int.defvjp(_qmatmul_fwd, _qmatmul_bwd)


def qmatmul(
    x: jax.Array,
    w: jax.Array,
    exp_x: jax.Array,
    exp_w: jax.Array,
    exp_g: jax.Array,
    *,
    bits_x: int,
    bits_w: int,
    bits_g: int,
    engine: str = "int8",
    stochastic: bool = False,
    noise_shared_axis0: bool = False,
    noise_bits: int = 24,
    backend: str = "xla",
    key_x: Optional[jax.Array] = None,
    key_w: Optional[jax.Array] = None,
) -> jax.Array:
    """Quantized ``x @ w`` (both operands DFXP-quantized).

    ``engine='sim'``: float fake-quant formulation (pure autodiff,
    reference semantics; f32 compute).  ``engine='sim_bf16'``: same
    fake-quant graph with the contraction in bf16 (exact for <=8-bit
    operand grids; the BASELINE.md "bf16-simulated-quantization"
    baseline).  ``engine='int8'``: forward and backward contractions run
    on integer codes; the backward cotangent is assumed to already lie
    on the ``(bits_g, exp_g)`` grid (placed there by the layer's
    ``grad_quant_barrier``).
    """
    if (
        engine in ("sim", "sim_bf16")
        or bits_x >= 32
        or bits_w >= 32
        or _code_dtype(bits_x, bits_w) is None
    ):
        xq = quantize_ste(
            x, bits_x, exp_x, key_x,
            stochastic=stochastic, noise_shared_axis0=noise_shared_axis0,
        )
        wq = quantize_ste(
            w, bits_w, exp_w, key_w,
            stochastic=stochastic, noise_shared_axis0=noise_shared_axis0,
        )
        if engine == "sim_bf16" and max(bits_x, bits_w) < 32:
            # fully-bf16 op (output upcast after) so the autodiff
            # transpose contractions stay dtype-consistent
            return lax.dot_general(
                xq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16), _MM,
            ).astype(jnp.float32)
        return lax.dot_general(xq, wq, _MM, preferred_element_type=jnp.float32)
    if engine == "pallas":
        backend = "pallas"
    grad_on_grid = bits_g < 32 and _code_dtype(bits_g, bits_w) is not None
    return _qmatmul_int(
        x, w, bits_x, bits_w, bits_g, stochastic, noise_shared_axis0,
        grad_on_grid, noise_bits, backend, exp_x, exp_w, exp_g,
        _keydata(key_x), _keydata(key_w),
    )


# ---------------------------------------------------------------------------
# quantized conv2d (NHWC x HWIO -> NHWC)
# ---------------------------------------------------------------------------


def conv_same_padding(in_size: int, k: int, stride: int) -> Tuple[int, int]:
    """TF-style 'SAME' padding (lo, hi) for one spatial dim."""
    out = -(-in_size // stride)
    total = max((out - 1) * stride + k - in_size, 0)
    lo = total // 2
    return lo, total - lo


def conv_pads(
    padding, in_sizes: Sequence[int], ks: Sequence[int],
    strides: Sequence[int],
) -> Tuple[Tuple[int, int], ...]:
    if isinstance(padding, str):
        if padding.upper() == "SAME":
            return tuple(
                conv_same_padding(i, k, s)
                for i, k, s in zip(in_sizes, ks, strides)
            )
        if padding.upper() == "VALID":
            return tuple((0, 0) for _ in in_sizes)
        raise ValueError(f"bad padding {padding!r}")
    return tuple(tuple(p) for p in padding)


_CONV_DN = ("NHWC", "HWIO", "NHWC")


def _conv(a, b, strides, pads, op_dt, acc_dt, *, lhs_dilation=None,
          rhs_dilation=None, dn=_CONV_DN):
    return lax.conv_general_dilated(
        a.astype(op_dt), b.astype(op_dt),
        window_strides=strides, padding=pads,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dn,
        preferred_element_type=acc_dt,
    ).astype(jnp.float32)


def _conv_fwd_compute(xc, wc, strides, pads, op_dt, acc_dt):
    return _conv(xc, wc, strides, pads, op_dt, acc_dt)


def _dx_conv_params(x_hw, k_hw, strides, pads, y_hw):
    """Padding for the input-gradient (transposed) conv.

    out = (y-1)*s + 1 + plo + phi - k + 1 must equal x for each dim.
    """
    new_pads = []
    for x, k, s, (lo, _hi), y in zip(x_hw, k_hw, strides, pads, y_hw):
        plo = k - 1 - lo
        phi = x + lo - 1 - (y - 1) * s
        new_pads.append((plo, phi))
    return tuple(new_pads)


def _dw_conv_params(x_hw, k_hw, strides, pads, y_hw):
    """Padding for the weight-gradient conv (contract over batch+space).

    out = x + lo + hi' - ((y-1)*s + 1) + 1 must equal k for each dim.
    """
    new_pads = []
    for x, k, s, (lo, hi), y in zip(x_hw, k_hw, strides, pads, y_hw):
        r = x + lo + hi - k - (y - 1) * s  # stride remainder, 0 <= r < s
        new_pads.append((lo, hi - r))
    return tuple(new_pads)


_QCV_STATIC = (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)


def _conv_fwd_9split(xc, wc, strides, pads):
    """Forward conv of 9-bit activation codes on the int8 MXU.

    c in [-256, 255] splits exactly as c = 2h + l with h = floor(c/2)
    in int8 and l in {0, 1}, so conv(c, w) = 2 conv(h, w) + conv(l, w)
    — two int8 x int8 -> int32 contractions, exact by construction
    (VERDICT round-4 #3; benchmarks/split9_probe.py: XLA's bf16 conv
    emitters reach only ~100-175 TOP/s at the ResNet-50 shapes while
    the int8 emitters reach 250-370, so the doubled int8 FLOPs still
    win ~1.2x at stage-1/2 shapes).  Only the forward conv is split:
    dx is already pure int8, and the dW emitters measured int8-hostile
    (BENCH_NOTES round-3 audit), so dW stays on the bf16 path.
    """
    cf = xc.astype(jnp.float32)
    h = jnp.floor(cf * 0.5)
    l = cf - 2.0 * h
    h8 = h.astype(jnp.int8)
    l8 = l.astype(jnp.int8)
    w8 = wc.astype(jnp.int8)
    a = lax.conv_general_dilated(
        h8, w8, strides, pads, dimension_numbers=_CONV_DN,
        preferred_element_type=jnp.int32)
    b = lax.conv_general_dilated(
        l8, w8, strides, pads, dimension_numbers=_CONV_DN,
        preferred_element_type=jnp.int32)
    return (2 * a + b).astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=_QCV_STATIC)
def _qconv_int(
    x, w, strides, pads, bits_x, bits_w, bits_g, stochastic, shared,
    grad_on_grid, noise_bits, backend, split9, exp_x, exp_w, exp_g, kx, kw,
):
    y, _ = _qconv_fwd(
        x, w, strides, pads, bits_x, bits_w, bits_g, stochastic, shared,
        grad_on_grid, noise_bits, backend, split9, exp_x, exp_w, exp_g,
        kx, kw,
    )
    return y


def _qconv_fwd(
    x, w, strides, pads, bits_x, bits_w, bits_g, stochastic, shared,
    grad_on_grid, noise_bits, backend, split9, exp_x, exp_w, exp_g,
    kx, kw,
):
    xc, mx = _codes(x, bits_x, exp_x, kx, stochastic, shared, noise_bits,
                    backend)
    wc, mw = _codes(w, bits_w, exp_w, kw, stochastic, shared, noise_bits,
                    backend)
    if split9 and bits_x == 9 and bits_w <= 8:
        y = _conv_fwd_9split(xc, wc, strides, pads) / (mx * mw)
        return y, (xc, wc, mx, mw, exp_g)
    op_dt, acc_dt = _code_dtype(bits_x, bits_w)
    xcb = _maybe_barrier(xc.astype(op_dt), "fwd_in")
    wcb = _maybe_barrier(wc.astype(op_dt), "fwd_in")
    y = _barrier_out(
        _conv(xcb, wcb, strides, pads, op_dt, acc_dt), "fwd_out",
    ) / (mx * mw)
    return y, (xc, wc, mx, mw, exp_g)


def _qconv_bwd(
    strides, pads, bits_x, bits_w, bits_g, stochastic, shared,
    grad_on_grid, noise_bits, backend, split9, res, g,
):
    xc, wc, mx, mw, exp_g = res
    x_hw = xc.shape[1:3]
    k_hw = wc.shape[0:2]
    y_hw = g.shape[1:3]

    if grad_on_grid:
        mg = multiplier(bits_g, exp_g)
        gc = _recover_codes(g, mg)
        scale_dx = 1.0 / (mg * mw)
        scale_dw = 1.0 / (mx * mg)
        dt_dx = _code_dtype(bits_g, bits_w)
        dt_dw = _code_dtype(bits_x, bits_g)
    else:
        gc = g
        mgc = 1.0
        scale_dx = 1.0 / (mgc * mw)
        scale_dw = 1.0 / (mx * mgc)
        dt_dx = dt_dw = (jnp.float32, jnp.float32)

    # dx: conv of g (lhs-dilated by stride) with spatially-flipped W
    # transposed to [kh, kw, Cout, Cin].
    w_flip = jnp.flip(wc, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx_pads = _dx_conv_params(x_hw, k_hw, strides, pads, y_hw)
    gc_dx = _maybe_barrier(gc.astype(dt_dx[0]), "bwd_in")
    dx = _barrier_out(
        _conv(
            gc_dx, w_flip, (1, 1), dx_pads, dt_dx[0], dt_dx[1],
            lhs_dilation=strides,
        ), "bwd_out",
    ) * scale_dx

    # dW: contraction of X with g over batch+space.  lhs = X viewed with
    # batch<->feature swapped ('CHWN'), rhs = g as an IHWO kernel dilated
    # by the forward stride, out = dW in HWNC layout (= [kh,kw,Cin,Cout]).
    dw_pads = _dw_conv_params(x_hw, k_hw, strides, pads, y_hw)
    gc_dw = (gc_dx if dt_dw[0] == dt_dx[0]
             else _maybe_barrier(gc.astype(dt_dw[0]), "bwd_in"))
    dw = _maybe_barrier(
        _conv(
            xc, gc_dw, (1, 1), dw_pads, dt_dw[0], dt_dw[1],
            rhs_dilation=strides, dn=("CHWN", "IHWO", "HWNC"),
        ), "bwd_out",
    ) * scale_dw  # dW is tiny ([kh,kw,Cin,Cout]); plain f32 barrier

    z = _float0(exp_g)
    k0 = np.zeros((2,), dtypes.float0)
    return (dx, dw, z, z, z, k0, k0)


_qconv_int.defvjp(_qconv_fwd, _qconv_bwd)


def qconv2d(
    x: jax.Array,
    w: jax.Array,
    exp_x: jax.Array,
    exp_w: jax.Array,
    exp_g: jax.Array,
    *,
    strides: Tuple[int, int],
    padding,
    bits_x: int,
    bits_w: int,
    bits_g: int,
    engine: str = "int8",
    stochastic: bool = False,
    noise_shared_axis0: bool = False,
    noise_bits: int = 24,
    backend: str = "xla",
    split9: bool = False,
    key_x: Optional[jax.Array] = None,
    key_w: Optional[jax.Array] = None,
) -> jax.Array:
    """Quantized 2-d convolution, NHWC activations x HWIO weights.

    Same engine contract as :func:`qmatmul`.  ``split9``: run the
    forward contraction of 9-bit activation codes as two exact int8
    convolutions (see :func:`_conv_fwd_9split`); no-op unless
    ``bits_x == 9`` and ``bits_w <= 8``.
    """
    strides = tuple(strides)
    pads = conv_pads(padding, x.shape[1:3], w.shape[0:2], strides)
    if (
        engine in ("sim", "sim_bf16")
        or bits_x >= 32
        or bits_w >= 32
        or _code_dtype(bits_x, bits_w) is None
    ):
        xq = quantize_ste(
            x, bits_x, exp_x, key_x,
            stochastic=stochastic, noise_shared_axis0=noise_shared_axis0,
        )
        wq = quantize_ste(
            w, bits_w, exp_w, key_w,
            stochastic=stochastic, noise_shared_axis0=noise_shared_axis0,
        )
        if engine == "sim_bf16" and max(bits_x, bits_w) < 32:
            return lax.conv_general_dilated(
                xq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                strides, pads, dimension_numbers=_CONV_DN,
            ).astype(jnp.float32)
        return lax.conv_general_dilated(
            xq, wq, strides, pads, dimension_numbers=_CONV_DN,
            preferred_element_type=jnp.float32,
        )
    if engine == "pallas":
        backend = "pallas"
    grad_on_grid = bits_g < 32 and _code_dtype(bits_g, bits_w) is not None
    return _qconv_int(
        x, w, strides, pads, bits_x, bits_w, bits_g, stochastic,
        noise_shared_axis0, grad_on_grid, noise_bits, backend, split9,
        exp_x, exp_w, exp_g, _keydata(key_x), _keydata(key_w),
    )
