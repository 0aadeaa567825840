"""DP scaling-ladder readiness on the virtual CPU mesh (BASELINE
config 5 prep: no multi-chip hardware in this environment, so the
deliverable is correctness + wire accounting the future real run can be
checked against — see MULTICHIP_NOTES.md).

For n_dev in 1, 2, 4, 8 (8 virtual CPU devices):
  * train the toy conv model for N steps under the shard_map DP step
    with the DFXP-int8 error-feedback all-reduce (int8 ppermute ring
    wire) and record the loss curve;
  * steps-to-loss: the first step at which the running-mean loss drops
    below a threshold, vs the single-device run (same global batch);
  * wire bytes per step per device: computed from the gradient pytree
    (f32 psum baseline vs int16/int8 ring + per-leaf exponent scalars);
  * error-feedback buffer drift: max |ebuf| against its one-grid-step
    bound  (the residual never exceeds one quantization step per leaf).

Usage: python benchmarks/scaling_ladder.py [--steps 200] [--json out]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import jax.numpy as jnp
import numpy as np

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.nn import (AvgPool, BatchNorm, Conv2d, Dense, Flatten, ReLU)
from lbt_tpu.nn.model import Model
from lbt_tpu.parallel.dp import make_dp_train_step
from lbt_tpu.parallel.lowbit import init_error_buffers
from lbt_tpu.parallel.mesh import make_mesh
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_train_step


def toy_model():
    cfg = QuantConfig.uniform(8, engine="int8", noise_mode="hash")
    return Model("ladder", [
        Conv2d("c1", cfg, (3, 3, 3, 32), use_bias=False),
        BatchNorm("bn1", cfg, 32),
        ReLU(),
        Conv2d("c2", cfg, (3, 3, 32, 32), use_bias=False),
        BatchNorm("bn2", cfg, 32),
        ReLU(),
        AvgPool(ksize=(8, 8), strides=(8, 8)),
        Flatten(dim=32),
        Dense("fc", cfg, 32, 10),
    ], input_shape=(8, 8, 3), num_classes=10, cfg=cfg)


def data(n, seed=0):
    rng = np.random.default_rng(seed)
    protos = rng.normal(0, 1, (10, 8, 8, 3)).astype(np.float32)
    y = rng.integers(0, 10, n).astype(np.int32)
    x = (protos[y] + rng.normal(0, 0.7, (n, 8, 8, 3))).astype(np.float32)
    return x, y


def wire_bytes(params, n_dev):
    """Per-step, per-device gradient all-reduce wire bytes (ring: each
    device sends (n-1) reduce-scatter + (n-1) all-gather messages of
    size P/n)."""
    p = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    leaves = len(jax.tree.leaves(params))
    msgs = 2 * (n_dev - 1)
    out = {}
    for name, bytes_per in (("f32_psum", 4), ("int16_ring", 2),
                            ("int8_ring", 1)):
        payload = msgs * (p // max(n_dev, 1)) * bytes_per
        # shared-exponent agreement: one max-all-reduce scalar per leaf
        payload += 0 if name == "f32_psum" else msgs * leaves * 4
        out[name] = payload
    return p, out


def run_ladder(n_dev, steps, batch_global=64, lr=0.05):
    model = toy_model()
    tc = TrainConfig(lr=lr, batch_size=batch_global)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    x, y = data(4096)
    losses, max_ebuf = [], 0.0
    if n_dev == 1:
        step = make_train_step(model, tc)
        for i in range(steps):
            s = (i * batch_global) % 4096
            params, qstate, vel, m = step(
                params, qstate, vel, x[s:s + batch_global],
                y[s:s + batch_global], i, jnp.float32(lr),
                jax.random.key(1))
            losses.append(float(m["loss"]))
        ebuf_bound = None
    else:
        mesh = make_mesh(data=n_dev, model=1,
                         devices=jax.devices()[:n_dev])
        dp = make_dp_train_step(model, tc, mesh, lowbit_bits=8,
                                lowbit_wire="int8")
        ebuf = init_error_buffers(params)
        for i in range(steps):
            s = (i * batch_global) % 4096
            params, qstate, vel, ebuf, m = dp(
                params, qstate, vel, ebuf, x[s:s + batch_global],
                y[s:s + batch_global], jnp.int32(i), jnp.float32(lr),
                jax.random.key(1))
            losses.append(float(m["loss"]))
            max_ebuf = max(max_ebuf, max(
                float(jnp.max(jnp.abs(b))) for b in jax.tree.leaves(ebuf)))
        ebuf_bound = max_ebuf
    return losses, ebuf_bound, params


def steps_to_loss(losses, thresh):
    run = []
    for i, l in enumerate(losses):
        run.append(l)
        if np.mean(run[-8:]) < thresh and i >= 8:
            return i
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--thresh", type=float, default=0.7)
    ap.add_argument("--json",
                    default=os.path.join(os.path.dirname(__file__),
                                         "scaling_ladder.json"))
    args = ap.parse_args()
    out = {"steps": args.steps, "loss_thresh": args.thresh, "rungs": {}}
    for n in (1, 2, 4, 8):
        losses, ebuf, params = run_ladder(n, args.steps)
        n_params, wires = wire_bytes(params, n)
        stl = steps_to_loss(losses, args.thresh)
        out["n_params"] = n_params
        out["rungs"][str(n)] = {
            "final_loss_mean8": round(float(np.mean(losses[-8:])), 4),
            "steps_to_loss": stl,
            "max_ebuf_abs": None if ebuf is None else round(ebuf, 6),
            "wire_bytes_per_step_per_device": wires,
        }
        print(f"n={n}: final {np.mean(losses[-8:]):.4f} steps-to-"
              f"{args.thresh} {stl} max|ebuf| {ebuf} wires {wires}",
              flush=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
