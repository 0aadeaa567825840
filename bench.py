"""Headline benchmark: DFP-INT8 ResNet-20/CIFAR-10 training throughput
per chip (BASELINE.md north-star metric).

Runs the full jitted train step (forward + quantized backward +
controllers + SGD) with the integer-compute engine, and the same recipe
with the float fake-quant simulation engine (the reference's formulation,
the "simulated quantization" baseline).  Prints ONE JSON line:

    {"metric": ..., "value": images/sec/chip (int8 engine),
     "unit": "images/sec/chip", "vs_baseline": int8_ips / sim_ips}
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.models import cifar10_resnet
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_train_step

BATCH = 512
WARMUP = 5
ITERS = 30


def measure(engine: str) -> float:
    cfg = QuantConfig.uniform(8, engine=engine)
    model = cifar10_resnet(cfg, 20)
    tc = TrainConfig(batch_size=BATCH)
    params, qstate = model.init(jax.random.key(0))
    velocity = momentum_init(params)
    step = make_train_step(model, tc)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, BATCH), jnp.int32)
    key = jax.random.key(1)
    lr = jnp.float32(1e-2)

    state = (params, qstate, velocity)
    for i in range(WARMUP):
        *state, m = step(*state, x, y, jnp.int32(i), lr, key)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for i in range(ITERS):
        *state, m = step(*state, x, y, jnp.int32(WARMUP + i), lr, key)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def main():
    ips_int8 = measure("int8")
    ips_sim = measure("sim")
    print(json.dumps({
        "metric": "resnet20_cifar10_dfp_int8_train_throughput",
        "value": round(ips_int8, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_int8 / ips_sim, 3),
    }))


if __name__ == "__main__":
    main()
