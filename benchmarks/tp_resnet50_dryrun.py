"""One-off: ResNet-50 bs128/224 dp4 x tp2 compile + execute on the
8-device virtual CPU mesh (round-4 VERDICT item 6 — the TP evidence was
toy-scale; the repeatable reduced-size equivalence test lives in
tests/test_parallel.py::test_tp_imagenet_resnet50_shapes, this script
records the full-size GSPMD partition actually executing).

Runs ONE jitted train step of the int8-a8 ResNet-50 at the headline
batch (128) and image size (224) with params tp-sharded per
param_pspecs (Cout over 'model') and the batch over 'data', then
reports loss finiteness, per-leaf shardings of the updated params, and
wall times.  Records to benchmarks/tp_resnet50_dryrun.json for
MULTICHIP_NOTES.md.

Usage: python benchmarks/tp_resnet50_dryrun.py [--batch 128]
       [--image 224] [--dp 4] [--tp 2]
"""

import argparse
import dataclasses
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
from jax.sharding import NamedSharding, PartitionSpec as P

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.models import imagenet_resnet
from lbt_tpu.parallel.mesh import make_mesh, param_pspecs, to_shardings
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--dp", type=int, default=4)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--json", default=os.path.join(
        os.path.dirname(__file__), "tp_resnet50_dryrun.json"))
    args = ap.parse_args()

    cfg = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        fused_bn=True, conv_act_extra=0)
    model = imagenet_resnet(cfg, 50, num_classes=1000,
                            image_size=args.image)
    mesh = make_mesh(data=args.dp, model=args.tp)

    t0 = time.time()
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    pspecs = param_pspecs(params)
    n_tp = sum("model" in str(s) for s in jax.tree.leaves(
        pspecs, is_leaf=lambda s: isinstance(s, P)))
    n_leaves = len(jax.tree.leaves(params))
    sh = to_shardings(mesh, pspecs)
    params = jax.device_put(params, sh)
    vel = jax.device_put(vel, sh)
    qstate = jax.device_put(qstate, NamedSharding(mesh, P()))
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.normal(0, 1, (args.batch, args.image, args.image, 3))
        .astype(np.float32), NamedSharding(mesh, P("data")))
    y = jax.device_put(
        rng.integers(0, 1000, args.batch).astype(np.int32),
        NamedSharding(mesh, P("data")))
    t_setup = time.time() - t0

    step = jax.jit(make_train_step(model, TrainConfig(
        batch_size=args.batch), jit=False))
    t0 = time.time()
    lowered = step.lower(params, qstate, vel, x, y, jnp.int32(0),
                         jnp.float32(0.01), jax.random.key(1))
    compiled = lowered.compile()
    t_compile = time.time() - t0

    t0 = time.time()
    p2, q2, v2, m = compiled(params, qstate, vel, x, y, jnp.int32(0),
                             jnp.float32(0.01), jax.random.key(1))
    loss = float(m["loss"])
    t_exec = time.time() - t0

    # updated params keep their tp shardings (no silent full replication)
    kept = sum(
        "model" in str(l.sharding.spec) for l in jax.tree.leaves(p2)
        if hasattr(l, "sharding"))
    out = {
        "mesh": {"data": args.dp, "model": args.tp},
        "batch": args.batch, "image": args.image,
        "tp_sharded_leaves": n_tp, "param_leaves": n_leaves,
        "tp_sharded_after_step": kept,
        "loss": loss, "loss_finite": bool(np.isfinite(loss)),
        "accuracy": float(m["accuracy"]),
        "setup_s": round(t_setup, 1), "compile_s": round(t_compile, 1),
        "exec_s": round(t_exec, 1),
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
