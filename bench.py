"""Headline benchmark: DFP-INT8 ResNet-20/CIFAR-10 training throughput
per chip (BASELINE.md north-star metric).

Measures the full train step (forward + quantized backward + controllers
+ SGD) for the integer-compute engine and for the bf16 fake-quant
simulation engine (the BASELINE.md "bf16-simulated-quantization"
baseline).  Prints ONE JSON line:

    {"metric": ..., "value": images/sec/chip (int8 engine),
     "unit": "images/sec/chip", "vs_baseline": int8_ips / bf16sim_ips}

Measurement notes (this environment tunnels a remote TPU):
* steps run in lax.scan blocks of UNROLL per dispatch — per-call RPC
  overhead would otherwise dominate ms-scale steps;
* batches are generated on device inside the jit — the tunnel re-ships
  array arguments on every call, which would measure the tunnel, not
  the chip;
* timing is forced by a device->host readback of the last loss, because
  ``block_until_ready`` on the experimental axon backend returns before
  execution completes.
"""

import json
import os
import time

import jax

# persistent compilation cache: repeated bench runs skip the multi-minute
# compiles (large on this tunneled backend)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lbt_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.models import cifar10_resnet
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_train_step

BATCH = 512
UNROLL = 60
REPEATS = 3
POOL = 8  # device-resident batches, cycled by step


def measure(engine: str, noise_mode: str = "prng") -> float:
    cfg = QuantConfig.uniform(8, engine=engine, noise_mode=noise_mode)
    model = cifar10_resnet(cfg, 20)
    tc = TrainConfig(batch_size=BATCH)
    params, qstate = model.init(jax.random.key(0))
    velocity = momentum_init(params)
    inner = make_train_step(model, tc, jit=False)

    # a small pool of device-resident batches indexed by step: real
    # training reads host-prefetched data, so PRNG-generating batches
    # inside the step would bill ~0.7 ms/step of threefry against the
    # train step itself
    kp = jax.random.key(7)
    xs_pool = jax.random.normal(
        kp, (POOL, BATCH, 32, 32, 3), jnp.float32)
    ys_pool = jax.random.randint(
        jax.random.fold_in(kp, 1), (POOL, BATCH), 0, 10, jnp.int32)

    def block(params, qstate, velocity, xs_pool, ys_pool, step0, lr, key):
        def body(carry, _):
            params, qstate, velocity, step = carry
            i = jax.lax.rem(step, POOL)
            x = jax.lax.dynamic_index_in_dim(xs_pool, i, keepdims=False)
            y = jax.lax.dynamic_index_in_dim(ys_pool, i, keepdims=False)
            params, qstate, velocity, m = inner(
                params, qstate, velocity, x, y, step, lr, key)
            return (params, qstate, velocity, step + 1), m["loss"]

        (params, qstate, velocity, _), losses = jax.lax.scan(
            body, (params, qstate, velocity, step0), None, length=UNROLL)
        return params, qstate, velocity, losses

    blockj = jax.jit(block, donate_argnums=(0, 1, 2))
    key = jax.random.key(1)
    lr = jnp.float32(1e-2)
    st = (params, qstate, velocity)
    *st, losses = blockj(*st, xs_pool, ys_pool, jnp.int32(0), lr, key)
    float(losses[-1])  # warm-up + forced completion
    best = 0.0
    for r in range(REPEATS):
        t0 = time.perf_counter()
        *st, losses = blockj(*st, xs_pool, ys_pool,
                             jnp.int32((r + 1) * UNROLL), lr, key)
        float(losses[-1])  # readback barrier
        best = max(best, BATCH * UNROLL / (time.perf_counter() - t0))
    return best


def main():
    # headline: int8 engine with the fused counter-hash rounding noise
    # (noise_mode='hash' — statistically equivalent stochastic rounding,
    # ~10 VPU ops/word; see benchmarks/BENCH_NOTES.md).  Baseline: bf16
    # fake-quant simulation with reference-style PRNG noise — i.e. the
    # reference semantics implemented straightforwardly on TPU.
    ips_int8 = measure("int8", "hash")
    ips_sim = measure("sim_bf16", "prng")
    print(json.dumps({
        "metric": "resnet20_cifar10_dfp_int8_train_throughput",
        "value": round(ips_int8, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_int8 / ips_sim, 3),
    }))


if __name__ == "__main__":
    main()
