"""VGG-16 / CIFAR-100 mixed-bit-width train-step throughput
(BASELINE.md config 3: DFP-INT4 weights / INT8 activations).

Same measurement discipline as imagenet_bench.py (scan blocks, on-device
batch generation, readback-forced timing, steady-state step counter).

Usage: python benchmarks/vgg_bench.py [--batch 256] [--only ...]
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

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.models.zoo import vgg16
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_train_step


def measure(cfg: QuantConfig, batch: int, unroll: int = 8,
            repeats: int = 3) -> float:
    model = vgg16(cfg)
    tc = TrainConfig(batch_size=batch)
    params, qstate = model.init(jax.random.key(0))
    velocity = momentum_init(params)
    inner = make_train_step(model, tc, jit=False)

    def block(params, qstate, velocity, step0, lr, key):
        def body(carry, _):
            params, qstate, velocity, step = carry
            kd = jax.random.fold_in(key, step)
            x = jax.random.normal(kd, (batch, 32, 32, 3), jnp.float32)
            y = jax.random.randint(
                jax.random.fold_in(kd, 1), (batch,), 0, 100, jnp.int32)
            params, qstate, velocity, m = inner(
                params, qstate, velocity, x, y, step, lr, key)
            return (params, qstate, velocity, step + 1), m["loss"]

        (params, qstate, velocity, _), losses = jax.lax.scan(
            body, (params, qstate, velocity, step0), None, length=unroll)
        return params, qstate, velocity, losses

    blockj = jax.jit(block, donate_argnums=(0, 1, 2))
    st = (params, qstate, velocity)
    lr = jnp.float32(1e-2)
    key = jax.random.key(1)
    base = jnp.int32(100_000)
    *st, losses = blockj(*st, base, lr, key)
    float(losses[-1])
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        *st, losses = blockj(*st, base + (r + 1) * unroll, lr, key)
        float(losses[-1])
        best = min(best, (time.perf_counter() - t0) / unroll)
    return best


def _mixed(bits_w, **kw):
    return dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash", **kw),
        bits_w=bits_w)


CONFIGS = {
    "fp32": QuantConfig.fp32(),
    "sim-bf16-w4a8": dataclasses.replace(
        QuantConfig.uniform(8, engine="sim_bf16", noise_mode="prng"),
        bits_w=4),
    "int4w-int8a": _mixed(4),
    "int4w-int8a-fbn-ru8": dataclasses.replace(
        _mixed(4), fused_bn=True, range_update_every=8),
    "int8w-int8a": _mixed(8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    names = args.only or list(CONFIGS)
    out = {"batch": args.batch, "results": {}}
    for name in names:
        dt = measure(CONFIGS[name], args.batch, args.unroll)
        ips = args.batch / dt
        out["results"][name] = {"ms_per_step": dt * 1e3, "img_per_s": ips}
        print(f"{name:20s} {dt * 1e3:8.2f} ms/step {ips:10.0f} img/s",
              flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
