"""Dump the optimized HLO of a bench config's train-step block (the
same jitted scan block imagenet_bench measures) so fusion names from
fusion_audit.py / XProf traces can be joined to their actual HLO bodies.

Usage: python benchmarks/hlo_dump.py [--config int8-a8-ru8-bf16c-h1]
       [--batch 128] [--unroll 16] [--out /tmp/headline.hlo]
"""

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_spec = importlib.util.spec_from_file_location(
    "imagenet_bench",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "imagenet_bench.py"))
_ib = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ib)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lbt_tpu.config import TrainConfig  # noqa: E402
from lbt_tpu.models import imagenet_resnet  # noqa: E402
from lbt_tpu.train.optim import momentum_init  # noqa: E402
from lbt_tpu.train.step import make_train_step  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="int8-a8-ru8-bf16c-h1",
                    choices=list(_ib.CONFIGS))
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--unroll", type=int, default=16)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--out", default="/tmp/headline.hlo")
    args = ap.parse_args()

    cfg = _ib.CONFIGS[args.config]
    model = imagenet_resnet(cfg, args.depth, num_classes=1000,
                            image_size=args.image)
    tc = TrainConfig(batch_size=args.batch)
    params, qstate = model.init(jax.random.key(0))
    velocity = momentum_init(params)
    inner = make_train_step(model, tc, jit=False)
    batch, image = args.batch, args.image

    def block(params, qstate, velocity, step0, lr, key):
        def body(carry, _):
            params, qstate, velocity, step = carry
            kd = jax.random.fold_in(key, step)
            from lbt_tpu.dfxp.quantize import hash_uniform
            x = hash_uniform(kd, (batch, image, image, 3)) * 2.0 - 1.0
            y = jax.random.randint(
                jax.random.fold_in(kd, 1), (batch,), 0, 1000, jnp.int32)
            params, qstate, velocity, m = inner(
                params, qstate, velocity, x, y, step, lr, key)
            return (params, qstate, velocity, step + 1), m["loss"]

        (params, qstate, velocity, _), losses = jax.lax.scan(
            body, (params, qstate, velocity, step0), None,
            length=args.unroll)
        return params, qstate, velocity, losses

    lowered = jax.jit(block, donate_argnums=(0, 1, 2)).lower(
        params, qstate, velocity, jnp.int32(0), jnp.float32(1e-2),
        jax.random.key(1))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
