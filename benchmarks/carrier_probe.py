"""Code-carrier vs value-carrier layer handoff (round-4 #1 premise).

The round-3 profile put stage 1-3 of the headline step at the HBM
roofline, with the largest streams being the bf16 VALUE carriers that
cross layer boundaries alongside the s8 code tensors of the same
activations (the BN fusion emits both; ROADMAP round 4).  Since the BN
output is a per-channel affine of its input codes, layers could hand
off ``(codes s8, scale[C], shift[C])`` instead of the materialized bf16
value — 1 byte/elem instead of 1+2.

This probe isolates that handoff at the hot shape.  One unit =

    conv1x1(int8 codes) -> dequant -> quantize to BN codes yc (s8)
    -> [BOUNDARY] -> ReLU(affine(yc)) -> quantize to next conv codes

with the boundary forced by jax.lax.optimization_barrier (no fusion
across it — whatever crosses must materialize, as it does in-model):

  value arm: yc AND the bf16 carrier = affine(yc) cross (the shipping
             situation: both tensors are emitted);
  code arm:  only yc (+ two f32[C] vectors) crosses; the affine+ReLU
             replays on the consumer side of the boundary.

Identical math; chained through a scan carry; k3-k1 subtraction.

Usage: python benchmarks/carrier_probe.py [--json out.json]
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

from lbt_tpu.dfxp.quantize import hash_uniform

INV = 1.0 / 1024.0
M_BN = 64.0
M_NEXT = 64.0


def _common_front(xq, w, seed):
    y = lax.dot_general(xq, w, (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * INV
    u = hash_uniform(jax.random.fold_in(jax.random.key(0), seed),
                     y.shape, light=True)
    yc = jnp.floor(jnp.clip(y * M_BN + u, -128.0, 127.0))
    return yc  # f32-valued integer codes


def _back(z, seed):
    u = hash_uniform(jax.random.fold_in(jax.random.key(1), seed),
                     z.shape, light=True)
    q = jnp.floor(jnp.clip(z * M_NEXT + u, -128.0, 127.0))
    return q.astype(jnp.int8)


def unit_value(xq, w, a, b, seed):
    yc = _common_front(xq, w, seed)
    carrier = (yc * a + b).astype(jnp.bfloat16)
    # the shipping handoff: codes (backward residual) AND carrier cross
    yc8, carrier = lax.optimization_barrier(
        (yc.astype(jnp.int8), carrier))
    z = jnp.maximum(carrier.astype(jnp.float32), 0.0)
    q = _back(z, seed)
    # keep the residual codes live (they are read by backward in-model)
    return q, yc8


def unit_code(xq, w, a, b, seed):
    yc = _common_front(xq, w, seed)
    # code handoff: only the s8 codes + per-channel affine cross
    yc8, a, b = lax.optimization_barrier((yc.astype(jnp.int8), a, b))
    z = jnp.maximum(yc8.astype(jnp.float32) * a + b, 0.0)
    q = _back(z, seed)
    return q, yc8


def chain(unit, n_units, length):
    def block(x, w, a, b):
        def body(carry, i):
            x, s = carry
            for j in range(n_units):
                q, yc8 = unit(x, w, a, b, s + i + j)
                s = s + yc8[0, 0, 0, 0].astype(jnp.int32)
                x = q
            return (x, s), ()
        (x, s), _ = lax.scan(body, (x, jnp.int32(0)), jnp.arange(length))
        return x.astype(jnp.float32).max() + s.astype(jnp.float32)
    return block


def measure(unit, name, b_, hw, c, length=32, reps=5):
    xq = jax.random.randint(jax.random.key(0), (b_, hw, hw, c), -8, 8,
                            jnp.int8)
    w = jax.random.randint(jax.random.key(1), (c, c), -3, 4, jnp.int8)
    a = jax.random.uniform(jax.random.key(2), (c,), jnp.float32, 0.5, 2.0)
    bb = jax.random.uniform(jax.random.key(3), (c,), jnp.float32, -1., 1.)
    times = {}
    for k in (1, 3):
        f = jax.jit(chain(unit, k, length))
        float(f(xq, w, a, bb))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(xq, w, a, bb))
            best = min(best, (time.perf_counter() - t0) / length)
        times[k] = best
    per = (times[3] - times[1]) / 2
    elems = b_ * hw * hw * c
    print(f"{name:6s} {b_}x{hw}x{hw}x{c}: {per * 1e3:7.3f} ms/unit "
          f"({elems / per / 1e9:6.1f} Gelem/s)", flush=True)
    return per * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    out = {}
    for hw, c in ((56, 256), (28, 512)):
        key = f"{hw}x{c}"
        v = measure(unit_value, "value", args.batch, hw, c)
        cd = measure(unit_code, "code", args.batch, hw, c)
        out[key] = {"value_ms": v, "code_ms": cd,
                    "speedup": round(v / cd, 3)}
        print(f"  -> code-carrier speedup {v / cd:.2f}x", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
