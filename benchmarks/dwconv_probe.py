"""Backward-conv formulations, isolated (scan-carry chained).

fused_conv_probe.py showed the FORWARD fused unit at the int8 roofline
inside XLA — so the in-model conv cost must sit in the backward
contractions.  This probes the two backward ops of a stride-1 3x3 conv
at ResNet-50 shapes, each in two formulations:

dW (contract X with g over batch+space):
  a) the shipping conv formulation: lax.conv with dn=("CHWN","IHWO",
     "HWNC") (lbt_tpu/ops/qops.py:_qconv_bwd)
  b) 9-shifted dot_general: dw[t] = xpad_shift[t] . g contracted over
     (B,H,W) — a clean [Ci, BHW] x [BHW, Co] MXU matmul per tap

dx (correlate g with flipped W):
  a) the shipping conv: lax.conv of g with W flipped+transposed
  b) 9-shifted dot_general: dx += shift(g . W[t]^T) accumulated

Both dtype regimes: int8 codes (the a8 path: int8 x int8 -> int32) and
bf16 (the faithful 9-bit-activation path).

Usage: python benchmarks/dwconv_probe.py [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lbt_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax import lax


def dw_conv(xc, gc, acc_dt):
    """Shipping formulation (qops.py:_qconv_bwd, stride 1 SAME 3x3)."""
    return lax.conv_general_dilated(
        xc, gc, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        preferred_element_type=acc_dt).astype(jnp.float32)


def dw_matmul(xc, gc, acc_dt):
    """9-shifted dot_general: one [Ci, BHW] x [BHW, Co] matmul per tap."""
    b, h, w, ci = xc.shape
    co = gc.shape[3]
    xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for kh in range(3):
        for kw in range(3):
            xs = lax.slice(xp, (0, kh, kw, 0), (b, kh + h, kw + w, ci))
            taps.append(lax.dot_general(
                xs, gc, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=acc_dt))
    return jnp.stack(taps).reshape(3, 3, ci, co).astype(jnp.float32)


def dx_conv(gc, wc, acc_dt):
    """Shipping: conv of g with spatially-flipped W^T (stride 1)."""
    w_flip = jnp.flip(wc, axis=(0, 1)).transpose(0, 1, 3, 2)
    return lax.conv_general_dilated(
        gc, w_flip, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dt).astype(jnp.float32)


def dx_matmul(gc, wc, acc_dt):
    """Per-tap [BHW, Co] x [Co, Ci] matmuls, shifted-accumulated."""
    b, h, w, co = gc.shape
    ci = wc.shape[2]
    out = jnp.zeros((b, h + 2, w + 2, ci), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            d = lax.dot_general(
                gc, wc[kh, kw].T, (((3,), (0,)), ((), ())),
                preferred_element_type=acc_dt).astype(jnp.float32)
            out = lax.dynamic_update_slice(
                out, lax.dynamic_slice(
                    out, (0, kh, kw, 0), (b, h, w, ci)) + d,
                (0, kh, kw, 0))
    return lax.slice(out, (0, 1, 1, 0), (b, h + 1, w + 1, ci))


def _rand(shape, dt, key):
    if dt == jnp.int8:
        return jax.random.randint(key, shape, -4, 4, jnp.int8)
    return (jax.random.normal(key, shape) * 0.1).astype(dt)


def chain_dw(fn, k, acc_dt, dt_in, length):
    def block(x, g):
        def body(c, _):
            g, s = c
            for _ in range(k):
                dw = fn(x, g, acc_dt)
                s = s + dw.sum()
                # thread s back through g so iterations are sequential
                # (value unchanged: 1e-30 rounds away in the cast)
                g = (g.astype(jnp.float32) + (s * 1e-30)).astype(dt_in)
            return (g, s), ()
        (g, s), _ = lax.scan(body, (g, jnp.float32(0)), None, length=length)
        return s
    return block


def chain_dx(fn, k, acc_dt, dt_in, length):
    def block(g, w):
        def body(c, _):
            g, s = c
            for _ in range(k):
                dx = fn(g, w, acc_dt)
                s = s + dx.sum()
                g = (dx * 1e-3 + s * 1e-30).astype(dt_in)
            return (g, s), ()
        (g, s), _ = lax.scan(body, (g, jnp.float32(0)), None, length=length)
        return s
    return block


def measure(make_chain, fn, name, shapes, dt_in, acc_dt, reps=5,
            length=32):
    b, hw, ci, co = shapes
    x = _rand((b, hw, hw, ci), dt_in, jax.random.key(0))
    g = _rand((b, hw, hw, co), dt_in, jax.random.key(1))
    w = _rand((3, 3, ci, co), dt_in, jax.random.key(2))
    args = (x, g) if make_chain is chain_dw else (g, w)
    times = {}
    for k in (1, 3):
        f = jax.jit(make_chain(fn, k, acc_dt, dt_in, length))
        float(f(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, (time.perf_counter() - t0) / length)
        times[k] = best
    per = (times[3] - times[1]) / 2
    fl = 2 * b * hw * hw * ci * co * 9
    print(f"{name:12s} {b}x{hw}x{hw} {ci}->{co} {jnp.dtype(dt_in).name:8s}"
          f" {per * 1e3:7.3f} ms  {fl / per / 1e12:6.1f} TOP/s", flush=True)
    return per * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    out = {}
    for hw, c in ((28, 128), (14, 256), (56, 64)):
        for dt_in, acc in ((jnp.int8, jnp.int32), (jnp.bfloat16, jnp.float32)):
            key = f"{hw}x{c}-{jnp.dtype(dt_in).name}"
            shapes = (args.batch, hw, c, c)
            out[key] = {
                "dw_conv": measure(chain_dw, dw_conv, "dw-conv", shapes,
                                   dt_in, acc),
                "dw_matmul": measure(chain_dw, dw_matmul, "dw-matmul",
                                     shapes, dt_in, acc),
                "dx_conv": measure(chain_dx, dx_conv, "dx-conv", shapes,
                                   dt_in, acc),
                "dx_matmul": measure(chain_dx, dx_matmul, "dx-matmul",
                                     shapes, dt_in, acc),
            }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
