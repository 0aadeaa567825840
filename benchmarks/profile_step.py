"""Capture a jax.profiler device trace of the ResNet-50 train step and
print the per-op time breakdown (top HLO categories) so optimization
targets the real bottleneck instead of guesses.

Usage: python benchmarks/profile_step.py [--config int8-hash-fbn]
       [--batch 64] [--unroll 4] [--outdir /tmp/lbt_profile]

Parses the trace.json.gz XProf export: sums duration by event name on
the device track and prints the top 25 plus a category rollup
(conv / matmul / fusion-elementwise / copy / other).
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lbt_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "imagenet_bench",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "imagenet_bench.py"))
_ib = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ib)


def capture(cfg, batch, unroll, outdir, base=0):
    import time

    import jax.numpy as jnp

    from lbt_tpu.config import TrainConfig
    from lbt_tpu.models import imagenet_resnet
    from lbt_tpu.train.optim import momentum_init
    from lbt_tpu.train.step import make_train_step

    model = imagenet_resnet(cfg, 50, num_classes=1000, image_size=224)
    tc = TrainConfig(batch_size=batch)
    params, qstate = model.init(jax.random.key(0))
    velocity = momentum_init(params)
    inner = make_train_step(model, tc, jit=False)

    def block(params, qstate, velocity, step0, lr, key):
        def body(carry, _):
            params, qstate, velocity, step = carry
            kd = jax.random.fold_in(key, step)
            # same synthetic input as imagenet_bench.measure (counter
            # hash, not threefry normal) so the trace matches the bench
            from lbt_tpu.dfxp.quantize import hash_uniform
            x = hash_uniform(kd, (batch, 224, 224, 3)) * 2.0 - 1.0
            y = jax.random.randint(
                jax.random.fold_in(kd, 1), (batch,), 0, 1000, jnp.int32)
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
    # base=0 profiles the controller-warmup regime (controllers ON every
    # step); steady-state profiling wants base past
    # range_update_warmup_steps and NOT ≡ 0 mod range_update_every so the
    # trace shows the gated-OFF steps a long run mostly consists of
    # (round-4 catch: the round-3 audit profiled ON steps only).
    *st, losses = blockj(*st, jnp.int32(base), lr, key)
    float(losses[-1])
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        *st, losses = blockj(*st, jnp.int32(base + unroll), lr, key)
        float(losses[-1])
    dt = time.perf_counter() - t0
    print(f"traced block: {dt * 1e3 / unroll:.2f} ms/step "
          f"({batch * unroll / dt:.0f} img/s)")


def analyze(outdir):
    """Roll up device op time by the profiler's ``hlo_category`` and by
    framework source line (both in each XLA-op event's args)."""
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    by_cat = defaultdict(float)
    by_src = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        args = e.get("args") or {}
        if e.get("ph") != "X" or "hlo_category" not in args:
            continue
        dur = e.get("dur", 0.0)
        cat = args["hlo_category"]
        by_cat[cat] += dur
        by_src[args.get("source", "?")] += dur
        by_op[(e.get("name", "?"), cat)] += dur
        total += dur
    print(f"\ndevice HLO-op time total {total / 1e3:.2f} ms  "
          f"[{os.path.basename(path)}]")
    print("\nby hlo_category:")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {dur / 1e3:9.3f} ms  {dur / max(total, 1) * 100:5.1f}%  "
              f"{cat}")
    print("\ntop 20 framework source lines:")
    for src, dur in sorted(by_src.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {dur / 1e3:9.3f} ms  {dur / max(total, 1) * 100:5.1f}%  "
              f"{src}")
    print("\ntop 20 ops:")
    for (name, cat), dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {dur / 1e3:9.3f} ms  {dur / max(total, 1) * 100:5.1f}%  "
              f"{name[:70]} [{cat}]")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="int8-hash-fbn",
                    choices=list(_ib.CONFIGS))
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--outdir", default="/tmp/lbt_profile")
    ap.add_argument("--base", type=int, default=0,
                    help="starting step (e.g. 100001 = steady state, "
                         "past controller warmup, off the ru cadence)")
    ap.add_argument("--analyze_only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(_ib.CONFIGS[args.config], args.batch, args.unroll,
                args.outdir, base=args.base)
    analyze(args.outdir)


if __name__ == "__main__":
    main()
