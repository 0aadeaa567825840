"""Per-kernel microbenchmarks (SURVEY.md §6 / §7 stage 5).

Measures the quantization primitives and quantized contractions on the
current default device and writes benchmarks/results.json.

    python benchmarks/kernels.py [--iters 20]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lbt_tpu.dfxp.quantize import quantize, quantize_int
from lbt_tpu.ops.qops import qconv2d, qmatmul

E = jnp.int32


def _readback(out):
    # force completion with a device->host transfer: block_until_ready on
    # the axon backend returns before execution finishes (BENCH_NOTES.md)
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _readback(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0])}

    # fused quantize (bandwidth-bound): f32 in -> int8 codes out
    x = jnp.asarray(rng.normal(0, 1, (4096, 4096)), jnp.float32)
    f_q = jax.jit(lambda v: quantize_int(v, 8, E(2))[0])
    dt = timeit(f_q, x, iters=args.iters)
    results["quantize_int8_4kx4k"] = {
        "ms": dt * 1e3, "GBps": (x.size * 5) / dt / 1e9}

    f_fq = jax.jit(lambda v: quantize(v, 8, E(2)))
    dt = timeit(f_fq, x, iters=args.iters)
    results["fakequant_4kx4k"] = {
        "ms": dt * 1e3, "GBps": (x.size * 8) / dt / 1e9}

    key = jax.random.key(0)
    f_sq = jax.jit(
        lambda v, k: quantize(v, 8, E(2), k, stochastic=True))
    dt = timeit(f_sq, x, key, iters=args.iters)
    results["stochastic_fakequant_4kx4k"] = {"ms": dt * 1e3}

    try:
        from lbt_tpu.ops.pallas import quantize_pallas
        f_pq = jax.jit(
            lambda v, s: quantize_pallas(v, 8, E(2), s, stochastic=True)[0])
        dt = timeit(f_pq, x, jnp.int32(1), iters=args.iters)
        results["pallas_stochastic_quantize_4kx4k"] = {"ms": dt * 1e3}
    except Exception as e:  # pallas may be unavailable off-TPU
        results["pallas_stochastic_quantize_4kx4k"] = {"error": str(e)[:80]}

    # hash-noise stochastic fake-quant (the fused fast path)
    f_hq = jax.jit(lambda v, k: quantize(
        v, 8, E(2), k, stochastic=True, backend="xla_hash"))
    dt = timeit(f_hq, x, key, iters=args.iters)
    results["hash_stochastic_fakequant_4kx4k"] = {"ms": dt * 1e3}

    # quantized matmul: int8 engine vs float sim
    m = k = n = 4096
    a = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 1, (k, n)), jnp.float32)
    flops = 2 * m * k * n
    for engine in ("int8", "sim"):
        f = jax.jit(lambda a, b, e=engine: qmatmul(
            a, b, E(2), E(2), E(2), bits_x=8, bits_w=8, bits_g=8,
            engine=e))
        dt = timeit(f, a, b, iters=args.iters)
        results[f"qmatmul_{engine}_4k"] = {
            "ms": dt * 1e3, "TOPS": flops / dt / 1e12}

    # Pallas v2: quantize-once passes + 512-tile int8 MXU kernel
    try:
        from lbt_tpu.ops.pallas import qmatmul_pallas
        for stoch in (False, True):
            f = jax.jit(lambda a, b, s=stoch: qmatmul_pallas(
                a, b, E(2), E(2), bits_x=8, bits_w=8,
                seed=jnp.int32(3) if s else None, stochastic=s))
            dt = timeit(f, a, b, iters=args.iters)
            tag = "stoch" if stoch else "det"
            results[f"qmatmul_pallas_v2_{tag}_4k"] = {
                "ms": dt * 1e3, "TOPS": flops / dt / 1e12}
    except Exception as e:
        results["qmatmul_pallas_v2_4k"] = {"error": str(e)[:80]}

    # quantized conv: resnet-ish shapes
    xc = jnp.asarray(rng.normal(0, 1, (256, 32, 32, 64)), jnp.float32)
    wc = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.float32)
    cflops = 2 * 256 * 32 * 32 * 64 * 3 * 3 * 64
    for engine in ("int8", "sim"):
        f = jax.jit(lambda a, b, e=engine: qconv2d(
            a, b, E(2), E(2), E(2), strides=(1, 1), padding="SAME",
            bits_x=9, bits_w=8, bits_g=8, engine=e))
        dt = timeit(f, xc, wc, iters=args.iters)
        results[f"qconv_{engine}_b256_32x32x64"] = {
            "ms": dt * 1e3, "TOPS": cflops / dt / 1e12}

    out = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
