"""Low-bit gradient all-reduce accuracy at MODEL scale (round-4 VERDICT
item 4: the scaling ladder certified steps-to-loss parity only on a
10,538-parameter toy; the error-feedback trick being scaled is exactly
``GradientBuffer_q``'s — reference dynamic_fixed_point.py:494-506 — and
its soundness is size- and horizon-dependent).

Trains ResNet-20 (~272k params, 100-class head) on the gap-sensitive
hard synthetic task at the certification point (signal 0.9, bs32,
lr 0.01 — the operating point where single-device DFXP-8 gaps measure
0.16-0.26% vs FP32, benchmarks/BENCH_NOTES.md) on the 8-device virtual
CPU mesh, with the DP shard_map step:

  * ``dp8-int8wire``: DFXP-int8 shared-exponent ring all-reduce with
    error feedback (lbt_tpu/parallel/lowbit.py, wire='int8');
  * ``dp8-f32``: exact f32 psum (the control — isolates the wire's
    incremental accuracy cost from DP itself).

32 epochs = 10,000 optimizer steps (>= the VERDICT's ebuf-drift
horizon); the epoch-16 accuracy row is the certification point
comparable to accuracy_CIFAR10_Resnet20_hard_cert.json.  Per-epoch we
record max|ebuf| and its ratio to the largest gradient grid step, so
unbounded error-feedback drift would be visible directly.

Usage:  JAX_PLATFORMS=cpu python benchmarks/lowbit_scale.py \
            [--epochs 32] [--configs dp8-int8wire dp8-f32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import jax.numpy as jnp
import numpy as np

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.data.datasets import load_dataset, make_augment
from lbt_tpu.models.zoo import build_model
from lbt_tpu.parallel.dp import make_dp_train_step
from lbt_tpu.parallel.lowbit import init_error_buffers
from lbt_tpu.parallel.mesh import make_mesh
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_eval_step


def ebuf_metrics(ebuf, vel):
    """Error-feedback drift metrics.  Per leaf the residual after each
    step is bounded by half a grid step of the leaf's dynamic shared
    exponent (~ max|grad + ebuf| * 2^(1-bits) * 2^ceil(log2 N)), so a
    sound run keeps max|ebuf| a small multiple of the gradient scale and
    FLAT over the horizon.  As a normalizer we use max|velocity| (the
    momentum buffer ~ the smoothed gradient sum at 1/(1-m) scale) —
    available without holding raw grads."""
    max_eb = max((float(jnp.max(jnp.abs(b)))
                  for b in jax.tree.leaves(ebuf)), default=0.0)
    max_v = max((float(jnp.max(jnp.abs(v)))
                 for v in jax.tree.leaves(vel)), default=0.0)
    return max_eb, (max_eb / max_v if max_v else None)


def run_config(name, data, augment, epochs, batch, lr, decay_epochs,
               seed=0):
    import dataclasses
    cfg = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        bn_momentum=0.99)
    model = build_model("CIFAR10_Resnet20", cfg, weight_decay=2e-4,
                        num_classes=data["num_classes"])
    tc = TrainConfig(lr=lr, batch_size=batch, n_epoch=epochs,
                     lr_decay_epochs=decay_epochs, seed=seed)
    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    lowbit = dict(lowbit_bits=8, lowbit_wire="int8") \
        if name == "dp8-int8wire" else dict(lowbit_bits=None)
    step_fn = make_dp_train_step(model, tc, mesh, **lowbit)
    eval_fn = make_eval_step(model)

    params, qstate = model.init(jax.random.key(seed))
    vel = momentum_init(params)
    ebuf = init_error_buffers(params)
    xtr, ytr = data["train"]
    n = xtr.shape[0] - xtr.shape[0] % batch
    rng = np.random.default_rng(seed)
    base_key = jax.random.key(seed + 1)
    data_key = jax.random.key(seed + 2)
    eval_key = jax.random.fold_in(base_key, 0xE7A1)

    curve, step = [], 0
    t0 = time.time()
    for epoch in range(epochs):
        cur_lr = lr * (0.1 ** sum(epoch >= e for e in decay_epochs))
        perm = rng.permutation(xtr.shape[0])[:n]
        for s in range(0, n, batch):
            idx = perm[s:s + batch]
            x = jnp.asarray(xtr[idx])
            if augment is not None:
                x = augment(jax.random.fold_in(data_key, step), x)
            params, qstate, vel, ebuf, m = step_fn(
                params, qstate, vel, ebuf, x, jnp.asarray(ytr[idx]),
                jnp.int32(step), jnp.float32(cur_lr), base_key)
            step += 1
        # eval (single-logical-device jit; params are replicated)
        xte, yte = data["test"]
        tot_a = tot_n = 0.0
        for s in range(0, xte.shape[0], 500):
            m = eval_fn(params, qstate, jnp.asarray(xte[s:s + 500]),
                        jnp.asarray(yte[s:s + 500]), eval_key)
            tot_a += float(m["accuracy"]) * (min(s + 500, xte.shape[0]) - s)
            tot_n += min(s + 500, xte.shape[0]) - s
        max_eb, eb_over_v = ebuf_metrics(ebuf, vel)
        rec = {"epoch": epoch + 1, "step": step,
               "accuracy": round(tot_a / tot_n, 4),
               "max_ebuf_abs": round(max_eb, 8),
               "ebuf_over_maxvel": (round(eb_over_v, 4)
                                    if eb_over_v is not None else None),
               "wall_s": round(time.time() - t0, 1)}
        curve.append(rec)
        print(f"[{name}] {rec}", flush=True)
    return {"config": name, "curve": curve,
            "final": curve[-1], "at_epoch16": next(
                (c for c in curve if c["epoch"] == 16), None)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=32)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--signal", type=float, default=0.9)
    ap.add_argument("--n_train", type=int, default=10000)
    ap.add_argument("--n_test", type=int, default=2000)
    ap.add_argument("--configs", nargs="*",
                    default=["dp8-int8wire", "dp8-f32"])
    ap.add_argument("--json", default=os.path.join(
        os.path.dirname(__file__), "lowbit_scale.json"))
    args = ap.parse_args()

    data = load_dataset("cifar10", n_train=args.n_train,
                        n_test=args.n_test, signal=args.signal,
                        override_classes=100)
    assert data["synthetic"]
    augment = make_augment("cifar10")
    decay = (args.epochs // 2, 3 * args.epochs // 4)
    out = {"model": "CIFAR10_Resnet20", "n_devices": 8,
           "task": {"signal": args.signal, "classes": 100,
                    "n_train": args.n_train},
           "recipe": {"epochs": args.epochs, "batch": args.batch,
                      "lr": args.lr, "lr_decay_epochs": list(decay)},
           "runs": []}
    for name in args.configs:
        out["runs"].append(run_config(
            name, data, augment, args.epochs, args.batch, args.lr, decay))
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print("wrote", args.json, flush=True)


if __name__ == "__main__":
    main()
