"""9-bit conv activations on the int8 MXU via code splitting — probe.

The faithful DFXP config quantizes conv activations at bits+1 = 9 bits
(reference dynamic_fixed_point.py:288), which forces the repo's conv
contractions onto the bf16 path (ops/qops.py _code_dtype: 9-bit codes
are exact in bf16 + f32 accumulation) and is the named blocker for the
faithful-config >=3x target (VERDICT round 4 #3).  An exact int8
alternative: split each 9-bit code c in [-256, 255] into

    c = 2*h + l,   h = floor(c/2) in [-128, 127] (int8),  l in {0, 1}

so  conv(c, w) = 2*conv(h, w) + conv(l, w)  — two int8 x int8 -> int32
contractions, exact by construction.  On paper this is FLOP-neutral
(int8 MXU throughput is 2x bf16 on TPU), so any win or loss comes from
emitter quality, operand bytes (2 x s8 = 1 x bf16), and fusion shape.

Arms, per ResNet-50/224 conv shape (forward and the dW contraction —
the two contractions the 9-bit operand poisons; dx is pure 8-bit):
  bf16      codes carried as bf16, one bf16 conv (current faithful path)
  split     codes carried as bf16, h/l derived in-body (producer fusion
            not modeled: split cost charged to the conv's prologue)
  split-pre h/l carried as two int8 planes (producer-side emission;
            models quantize_int emitting the planes directly)

Methodology follows conv1x1_probe.py: scan-chained bodies with a
carry-dependent input (no CSE), device->host readback to force timing,
and an n=3 minus n=1 subtraction so chain plumbing cancels.

Usage: python benchmarks/split9_probe.py [--json out.json]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lbt_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import argparse
import json

import jax.numpy as jnp
import numpy as np
from jax import lax

_DN_FWD = ("NHWC", "HWIO", "NHWC")
_DN_DW = ("CHWN", "IHWO", "HWNC")


def _split(c):
    """bf16 9-bit codes -> (h, l) int8 planes with c = 2h + l."""
    cf = c.astype(jnp.float32)
    h = jnp.floor(cf * 0.5)
    l = cf - 2.0 * h
    return h.astype(jnp.int8), l.astype(jnp.int8)


def fwd_bf16(c, w, stride):
    return lax.conv_general_dilated(
        c, w, (stride, stride), "SAME", dimension_numbers=_DN_FWD,
        preferred_element_type=jnp.float32)


def fwd_split(c, w, stride):
    h, l = _split(c)
    w8 = w.astype(jnp.int8)
    a = lax.conv_general_dilated(
        h, w8, (stride, stride), "SAME", dimension_numbers=_DN_FWD,
        preferred_element_type=jnp.int32)
    b = lax.conv_general_dilated(
        l, w8, (stride, stride), "SAME", dimension_numbers=_DN_FWD,
        preferred_element_type=jnp.int32)
    return (2 * a + b).astype(jnp.float32)


def fwd_split_pre(h, l, w8, stride):
    a = lax.conv_general_dilated(
        h, w8, (stride, stride), "SAME", dimension_numbers=_DN_FWD,
        preferred_element_type=jnp.int32)
    b = lax.conv_general_dilated(
        l, w8, (stride, stride), "SAME", dimension_numbers=_DN_FWD,
        preferred_element_type=jnp.int32)
    return (2 * a + b).astype(jnp.float32)


def _dw_pads(x_hw, k_hw, stride, y_hw):
    # mirror ops/qops.py _dw_conv_params for SAME padding
    from lbt_tpu.ops.qops import conv_pads, _dw_conv_params
    pads = conv_pads("SAME", x_hw, k_hw, (stride, stride))
    return _dw_conv_params(x_hw, k_hw, (stride, stride), pads, y_hw)


def dw_bf16(c, g, k_hw, stride):
    pads = _dw_pads(c.shape[1:3], k_hw, stride,  g.shape[1:3])
    return lax.conv_general_dilated(
        c, g, (1, 1), pads, rhs_dilation=(stride, stride),
        dimension_numbers=_DN_DW, preferred_element_type=jnp.float32)


def dw_split(c, g, k_hw, stride):
    h, l = _split(c)
    g8 = g.astype(jnp.int8)
    pads = _dw_pads(c.shape[1:3], k_hw, stride, g.shape[1:3])
    a = lax.conv_general_dilated(
        h, g8, (1, 1), pads, rhs_dilation=(stride, stride),
        dimension_numbers=_DN_DW, preferred_element_type=jnp.int32)
    b = lax.conv_general_dilated(
        l, g8, (1, 1), pads, rhs_dilation=(stride, stride),
        dimension_numbers=_DN_DW, preferred_element_type=jnp.int32)
    return (2 * a + b).astype(jnp.float32)


def check_exact():
    """Split arms must be bit-identical to the bf16 arm."""
    rng = np.random.default_rng(0)
    c = rng.integers(-256, 256, (4, 14, 14, 32)).astype(np.float32)
    w = rng.integers(-128, 128, (3, 3, 32, 48)).astype(np.float32)
    g = rng.integers(-128, 128, (4, 14, 14, 48)).astype(np.float32)
    cb = jnp.asarray(c, jnp.bfloat16)
    wb = jnp.asarray(w, jnp.bfloat16)
    gb = jnp.asarray(g, jnp.bfloat16)
    y0 = np.asarray(jax.jit(fwd_bf16, static_argnums=2)(cb, wb, 1))
    y1 = np.asarray(jax.jit(fwd_split, static_argnums=2)(cb, wb, 1))
    np.testing.assert_array_equal(y0, y1)
    d0 = np.asarray(jax.jit(dw_bf16, static_argnums=(2, 3))(
        cb, gb, (3, 3), 1))
    d1 = np.asarray(jax.jit(dw_split, static_argnums=(2, 3))(
        cb, gb, (3, 3), 1))
    np.testing.assert_array_equal(d0, d1)
    print("exactness: split == bf16 (forward and dW)", flush=True)


def _chain_fwd(unit, n, pre):
    def block(c, w, length):
        def body(carry, i):
            x, s = carry
            for j in range(n):
                if pre:
                    h = x.astype(jnp.int8)
                    l = (s % 2).astype(jnp.int8) * jnp.ones_like(h)
                    y = fwd_split_pre(h, l, w.astype(jnp.int8), 1)
                else:
                    y = unit(x, w, 1)
                s = s + y[0, 0, 0, 0].astype(jnp.int32)
                # re-derive a same-shape input from the output so the
                # next conv depends on this one (codes stay in range)
                x = (x + (s % 2).astype(x.dtype)).astype(x.dtype)
            return (x, s), ()
        def run(c0, s0):
            (xf, sf), _ = lax.scan(body, (c0, s0), jnp.arange(length))
            return xf.astype(jnp.float32).sum() + sf.astype(jnp.float32)
        return run(c, jnp.int32(0))
    return block


def measure_fwd(b, hw, cin, cout, k, reps=5, length=16):
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.integers(-200, 200, (b, hw, hw, cin)),
                    jnp.bfloat16)
    w = jnp.asarray(rng.integers(-100, 100, (k, k, cin, cout)),
                    jnp.bfloat16)
    out = {}
    for name, unit, pre in (("bf16", fwd_bf16, False),
                            ("split", fwd_split, False),
                            ("split_pre", None, True)):
        times = {}
        for n in (1, 3):
            f = jax.jit(_chain_fwd(unit, n, pre), static_argnums=2)
            float(f(c, w, length))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(c, w, length))
                best = min(best, (time.perf_counter() - t0) / length)
            times[n] = best
        per = (times[3] - times[1]) / 2
        tops = 2 * b * hw * hw * cin * cout * k * k / 1e12
        out[name] = per * 1e3
        print(f"  fwd {name:10s} {per*1e3:7.3f} ms  "
              f"{tops/per:6.1f} TOP/s", flush=True)
    return out


def _chain_dw(unit, n):
    def block(c, g, k_hw, length):
        def body(carry, i):
            x, s = carry
            for j in range(n):
                dw = unit(x, g, k_hw, 1)
                s = s + dw[0, 0, 0, 0].astype(jnp.int32)
                x = (x + (s % 2).astype(x.dtype)).astype(x.dtype)
            return (x, s), ()
        def run(c0, s0):
            (xf, sf), _ = lax.scan(body, (c0, s0), jnp.arange(length))
            return xf.astype(jnp.float32).sum() + sf.astype(jnp.float32)
        return run(c, jnp.int32(0))
    return block


def measure_dw(b, hw, cin, cout, k, reps=5, length=16):
    rng = np.random.default_rng(2)
    c = jnp.asarray(rng.integers(-200, 200, (b, hw, hw, cin)),
                    jnp.bfloat16)
    g = jnp.asarray(rng.integers(-100, 100, (b, hw, hw, cout)),
                    jnp.bfloat16)
    out = {}
    for name, unit in (("bf16", dw_bf16), ("split", dw_split)):
        times = {}
        for n in (1, 3):
            f = jax.jit(_chain_dw(unit, n), static_argnums=(2, 3))
            float(f(c, g, (k, k), length))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(f(c, g, (k, k), length))
                best = min(best, (time.perf_counter() - t0) / length)
            times[n] = best
        per = (times[3] - times[1]) / 2
        tops = 2 * b * hw * hw * cin * cout * k * k / 1e12
        out[name] = per * 1e3
        print(f"  dW  {name:10s} {per*1e3:7.3f} ms  "
              f"{tops/per:6.1f} TOP/s", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--shapes", nargs="*",
                    default=["56x64x64x3", "28x128x128x3",
                             "14x256x256x3", "56x64x256x1"])
    args = ap.parse_args()
    check_exact()
    res = {}
    for s in args.shapes:
        hw, cin, cout, k = (int(v) for v in s.split("x"))
        print(f"[{args.batch}x{hw}x{hw} {cin}->{cout} k{k}]", flush=True)
        res[s] = {"fwd": measure_fwd(args.batch, hw, cin, cout, k),
                  "dw": measure_dw(args.batch, hw, cin, cout, k)}
    for s, r in res.items():
        f_ratio = r["fwd"]["bf16"] / r["fwd"]["split_pre"]
        d_ratio = r["dw"]["bf16"] / r["dw"]["split"]
        print(f"{s}: fwd split_pre speedup {f_ratio:.2f}x, "
              f"dW split speedup {d_ratio:.2f}x", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
