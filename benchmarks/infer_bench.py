"""Serving benchmark: batch inference latency/throughput per engine.

The reference has no inference path (training script only); lbt-tpu's
serving tier (lbt_tpu/infer.py) runs the deterministic int8 forward on
the MXU.  This measures jitted predict on ResNet-50/224 (BASELINE
configs 4-5 shapes) across engines and batch sizes:

    fp32       unquantized floor
    sim-bf16   bf16 fake-quant forward
    int8       integer-code forward (serving config)
    int8-a8    + conv acts at 8 bits -> int8 x int8 MXU convs

Usage: python benchmarks/infer_bench.py [--batches 1 8 64 256]
       [--depth 50] [--image 224] [--json out.json]
Prints one line per (config, batch): ms/batch and img/s.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lbt_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from lbt_tpu.config import QuantConfig
from lbt_tpu.infer import make_predict_fn
from lbt_tpu.models import imagenet_resnet


def measure(cfg: QuantConfig, batch: int, depth: int, image: int,
            classes: int, unroll: int = 20, repeats: int = 3,
            fold_bn: bool = False) -> float:
    model = imagenet_resnet(cfg, depth, num_classes=classes,
                            image_size=image)
    params, qstate = model.init(jax.random.key(0))
    if fold_bn:
        from lbt_tpu.infer import fold_batchnorm
        model, params, qstate = fold_batchnorm(model, params, qstate)
    predict = make_predict_fn(model)

    # scan-unrolled block over a device-resident batch pool: amortizes
    # the tunnel's per-dispatch RPC latency (see bench.py notes); the
    # label-sum readback forces completion.
    pool = 4
    xs = jax.random.normal(jax.random.key(7),
                           (pool, batch, image, image, 3), jnp.float32)

    def block(params, qstate, xs):
        def body(acc, i):
            x = jax.lax.dynamic_index_in_dim(xs, jax.lax.rem(i, pool),
                                             keepdims=False)
            labels = predict(params, qstate, x)
            return acc + jnp.sum(labels), None

        acc, _ = jax.lax.scan(body, jnp.int32(0),
                              jnp.arange(unroll, dtype=jnp.int32))
        return acc

    blockj = jax.jit(block)
    int(blockj(params, qstate, xs))  # warm-up + forced completion
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        int(blockj(params, qstate, xs))
        best = min(best, (time.perf_counter() - t0) / unroll)
    return best


CONFIGS = {
    "fp32": QuantConfig.fp32(),
    "sim-bf16": QuantConfig.uniform(8, engine="sim_bf16", stochastic=False),
    "int8": QuantConfig.uniform(8, engine="int8", stochastic=False),
    "int8-a8": dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", stochastic=False),
        conv_act_extra=0),
    # int8-a8 with BatchNorm folded into the conv weights
    # (lbt_tpu.infer.fold_batchnorm): no BN elementwise pass, no BN
    # input-quantization site — the full deployment artifact
    "int8-a8-fold": dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", stochastic=False),
        conv_act_extra=0),
}
FOLDED = {"int8-a8-fold"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 8, 64, 256])
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--classes", type=int, default=1000)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    names = args.only or list(CONFIGS)
    out = {"depth": args.depth, "image": args.image, "results": []}
    for name in names:
        for batch in args.batches:
            dt = measure(CONFIGS[name], batch, args.depth, args.image,
                         args.classes, fold_bn=name in FOLDED)
            ips = batch / dt
            out["results"].append({
                "config": name, "batch": batch,
                "ms_per_batch": dt * 1e3, "img_per_s": ips})
            print(f"{name:10s} bs={batch:<4d} {dt * 1e3:8.2f} ms/batch "
                  f"{ips:10.0f} img/s", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
