"""Step-time ablation: where does the DFP-INT8 train step spend time?

Measures the full ResNet-20/CIFAR-10 train step under a ladder of
configs that each remove/replace one cost source, so the deltas isolate
what the remaining gap to speed-of-light is made of:

    fp32            no quantization at all (the floor)
    det-int8        int8 engine, deterministic rounding (no noise cost)
    hash-int8       int8 engine, counter-hash noise (headline config)
    prng-int8       int8 engine, threefry noise (reference-grade stream)
    hash-int8-fbn   + lean fused BatchNorm (one quantization per BN)
    hash-pallas     Pallas fused kernels
    sim-bf16-prng   the bf16 fake-quant baseline (BASELINE.md)

Usage: python benchmarks/ablate.py [--batch 512] [--unroll 20]
Prints one line per config: ms/step and img/s.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lbt_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.models import cifar10_resnet
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_train_step


def measure(cfg: QuantConfig, batch: int, unroll: int,
            repeats: int = 3, depth: int = 20) -> float:
    model = cifar10_resnet(cfg, depth)
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
                jax.random.fold_in(kd, 1), (batch,), 0, 10, jnp.int32)
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
    # steady-state regime: step counter past the controller warmup
    # window so cadence configs measure their gated behavior
    base = jnp.int32(100_000)
    *st, losses = blockj(*st, base, lr, key)
    float(losses[-1])  # warm-up; forced completion via readback
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        *st, losses = blockj(*st, base + (r + 1) * unroll, lr, key)
        float(losses[-1])
        best = min(best, (time.perf_counter() - t0) / unroll)
    return best


CONFIGS = {
    "fp32": QuantConfig.fp32(),
    "det-int8": QuantConfig.uniform(8, engine="int8", stochastic=False),
    "hash-int8": QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
    "prng-int8": QuantConfig.uniform(8, engine="int8", noise_mode="prng"),
    "hash-int8-fbn": dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        fused_bn=True),
    "rbg-int8": QuantConfig.uniform(8, engine="int8", noise_mode="prng",
                                    noise_impl="unsafe_rbg"),
    "hash-pallas": QuantConfig.uniform(8, engine="pallas",
                                       noise_mode="hash"),
    "sim-bf16-prng": QuantConfig.uniform(8, engine="sim_bf16",
                                         noise_mode="prng"),
    "hash-int8-fbn-ru8": dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        fused_bn=True, range_update_every=8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--unroll", type=int, default=20)
    ap.add_argument("--depth", type=int, default=20)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    names = args.only or list(CONFIGS)
    for name in names:
        dt = measure(CONFIGS[name], args.batch, args.unroll,
                     depth=args.depth)
        print(f"{name:16s} {dt * 1e3:8.2f} ms/step "
              f"{args.batch / dt:10.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
