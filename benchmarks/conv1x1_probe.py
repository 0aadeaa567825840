"""Stage-1 1x1 fused unit: Pallas matmul kernel vs XLA's conv emitter.

The steady-state fusion audit (fusion_audit.py, round 4) measured the
in-model stage-1 1x1 conv+quantize+moments fusions at ~220 GB/s
(64->256 expand, fusion.230-class) and ~370 GB/s (256->64 contract,
fusion.4354-class).  This probe chains the EXPAND+CONTRACT pair through
a lax.scan carry (fused_conv_probe.py methodology: readback-forced,
k3-k1 subtraction so chain plumbing cancels) and compares the XLA arm
against conv1x1_fused_int8.

Usage: python benchmarks/conv1x1_probe.py [--json out.json]
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
from lbt_tpu.ops.pallas.conv1x1_kernels import conv1x1_fused_int8

INV = 1.0 / 1024.0
MULT = 64.0


def xla_unit(xq, wq, seed):
    c, k = wq.shape
    y = lax.conv_general_dilated(
        xq, wq.reshape(1, 1, c, k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32) * INV
    mm = jnp.stack([y.min(), y.max()])
    u = hash_uniform(jax.random.fold_in(jax.random.key(0), seed),
                     y.shape, light=True)
    q = jnp.floor(jnp.clip(y * MULT + u, -128.0, 127.0))
    mom = jnp.stack([q.sum(axis=(0, 1, 2)), (q * q).sum(axis=(0, 1, 2))])
    return q.astype(jnp.int8), mom, mm


def pallas_unit(xq, wq, seed):
    return conv1x1_fused_int8(
        xq, wq, jnp.float32(INV), jnp.float32(MULT), seed,
        bits_out=8, stochastic=True)


def chain(unit, n_pairs, length=8):
    """Each chain element: expand c->k then contract k->c (the stage-1
    block pattern), so the carry keeps the input shape."""
    def block(x, w_up, w_dn, key):
        def body(carry, i):
            x, s = carry
            for j in range(n_pairs):
                yq, mom, mm = unit(x, w_up, s + i + 2 * j)
                s = s + mom[0, 0].astype(jnp.int32) + mm[0].astype(jnp.int32)
                yq2, mom2, mm2 = unit(yq, w_dn, s + i + 2 * j + 1)
                s = s + mom2[0, 0].astype(jnp.int32) + mm2[0].astype(jnp.int32)
                x = yq2
            return (x, s), ()
        (x, s), _ = lax.scan(body, (x, key), jnp.arange(length))
        return x.astype(jnp.float32).max() + s.astype(jnp.float32)
    return block


def measure(unit, name, b, hw, c, k, length=32, reps=5):
    xq = jax.random.randint(jax.random.key(0), (b, hw, hw, c), -8, 8,
                            jnp.int8)
    w_up = jax.random.randint(jax.random.key(1), (c, k), -2, 3, jnp.int8)
    w_dn = jax.random.randint(jax.random.key(2), (k, c), -2, 3, jnp.int8)
    times = {}
    for n in (1, 3):
        f = jax.jit(chain(unit, n, length))
        float(f(xq, w_up, w_dn, jnp.int32(7)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(xq, w_up, w_dn, jnp.int32(7)))
            best = min(best, (time.perf_counter() - t0) / length)
        times[n] = best
    per = (times[3] - times[1]) / 2  # one expand+contract pair
    gb = (b * hw * hw * (c + k + k + c)) / 1e9  # s8 in+out per pair
    print(f"{name:8s} {b}x{hw}x{hw} {c}<->{k}: {per * 1e3:7.3f} ms/pair "
          f"{gb / per:6.0f} GB/s(min-bytes)  (t1 {times[1] * 1e3:.2f} "
          f"t3 {times[3] * 1e3:.2f})", flush=True)
    return {"ms_per_pair": per * 1e3, "gbps_min_bytes": gb / per}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--shapes", nargs="*", default=["56x64x256",
                                                    "28x128x512"])
    args = ap.parse_args()
    out = {}
    for s in args.shapes:
        hw, c, k = (int(v) for v in s.split("x"))
        out[s] = {
            "xla": measure(xla_unit, "xla", args.batch, hw, c, k),
            "pallas": measure(pallas_unit, "pallas", args.batch, hw, c, k),
        }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
