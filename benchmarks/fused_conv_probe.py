"""Fused conv+epilogue: Pallas kernel vs XLA's fused pipeline, isolated.

The measured unit is the full DFXP conv pipeline of the a8 path (the
in-model "convolution fusion" whose ~27 TOP/s average motivated the
kernel — benchmarks/BENCH_NOTES.md):

    int8 conv -> dequant -> controller min/max -> stochastic quantize
    (next site's int8 codes) -> BN moments of the codes

chained through a lax.scan carry (yq feeds the next iteration's input)
so nothing can be elided — the conv_probe.py methodology.  The XLA arm
uses the shipping hash-noise quantize; the Pallas arm the in-kernel
hardware PRNG; both are timed with the k3-k1 subtraction so the chain
plumbing cancels.

Usage: python benchmarks/fused_conv_probe.py [--json out.json]
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
from jax import lax

from lbt_tpu.dfxp.quantize import hash_uniform
from lbt_tpu.ops.pallas.conv_kernels import conv3x3_fused_int8

INV = 1.0 / 1024.0
MULT = 64.0


def xla_unit(xq, wq, seed):
    """The XLA arm: identical math, shipping-style ops."""
    y = lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32) * INV
    mm = jnp.stack([y.min(), y.max()])
    u = hash_uniform(jax.random.fold_in(jax.random.key(0), seed),
                     y.shape, light=True)
    q = jnp.floor(jnp.clip(y * MULT + u, -128.0, 127.0))
    mom = jnp.stack([q.sum(axis=(0, 1, 2)),
                     (q * q).sum(axis=(0, 1, 2))])
    return q.astype(jnp.int8), mom, mm


def pallas_unit(xq, wq, seed):
    return conv3x3_fused_int8(
        xq, wq, jnp.float32(INV), jnp.float32(MULT), seed,
        bits_out=8, stochastic=True)


def chain(unit, n_units, length=8):
    def block(x, w, key):
        def body(carry, i):
            x, s = carry
            for j in range(n_units):
                yq, mom, mm = unit(x, w, s + i + j)
                # fold the side outputs into a live scalar so they are
                # computed every iteration
                s = s + mom[0, 0].astype(jnp.int32) + mm[0].astype(jnp.int32)
                x = yq
            return (x, s), ()
        (x, s), _ = lax.scan(body, (x, key), jnp.arange(length))
        return x.astype(jnp.float32).max() + s.astype(jnp.float32)
    return block


def measure(unit, name, b, hw, c, length=32, reps=5):
    rng = jax.random.key(0)
    xq = jax.random.randint(rng, (b, hw, hw, c), -8, 8, jnp.int8)
    wq = jax.random.randint(jax.random.key(1), (3, 3, c, c), -2, 3,
                            jnp.int8)
    times = {}
    for k in (1, 3):
        f = jax.jit(chain(unit, k, length))
        float(f(xq, wq, jnp.int32(7)))  # compile + warm (readback-forced)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(xq, wq, jnp.int32(7)))
            best = min(best, (time.perf_counter() - t0) / length)
        times[k] = best
    per = (times[3] - times[1]) / 2
    fl = 2 * b * hw * hw * c * c * 9
    tops = fl / per / 1e12
    print(f"{name:8s} {b}x{hw}x{hw}x{c}: {per * 1e3:7.3f} ms/unit "
          f"{tops:6.1f} TOP/s  (t1 {times[1] * 1e3:.2f} t3 "
          f"{times[3] * 1e3:.2f})", flush=True)
    return {"ms_per_unit": per * 1e3, "tops": tops}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--shapes", nargs="*", default=["28x128", "14x256"])
    args = ap.parse_args()
    out = {}
    for s in args.shapes:
        hw, c = (int(v) for v in s.split("x"))
        out[s] = {
            "xla": measure(xla_unit, "xla", args.batch, hw, c),
            "pallas": measure(pallas_unit, "pallas", args.batch, hw, c),
        }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
