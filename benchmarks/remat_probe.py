"""Probe: block-level rematerialization of the ResNet train step.

The conv custom_vjps already save only int8 codes (lbt_tpu/ops/qops.py),
but the elementwise chain between convs is plain autodiff, so its
backward residuals (BN inputs, ReLU outputs, quantizer pre-images) are
full f32 activation tensors.  Wrapping each residual block in
``jax.checkpoint`` drops those saves to one f32 tensor per block
boundary and recomputes the (int8-cheap) forward inside the backward
pass — a bandwidth-for-FLOPs trade on a VPU/bandwidth-bound profile
(benchmarks/BENCH_NOTES.md "Where the step time goes").

Usage: python benchmarks/remat_probe.py [--config int8-a8] [--batch 128]
Prints ms/step and img/s with and without block remat.
"""

import argparse
import dataclasses
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lbt_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

_spec = importlib.util.spec_from_file_location(
    "imagenet_bench",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "imagenet_bench.py"))
_ib = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ib)

from lbt_tpu.nn.blocks import ResidualBlock  # noqa: E402


def patch_remat():
    orig_apply = ResidualBlock.apply

    def remat_apply(self, params, qstate, sinks, x, ctx):
        if not ctx.train:
            return orig_apply(self, params, qstate, sinks, x, ctx)

        def f(params, qstate, sinks, x, key):
            c2 = dataclasses.replace(ctx, key=key)
            return orig_apply(self, params, qstate, sinks, x, c2)

        # prevent_cse=False: the step body runs under lax.scan, where
        # CSE across the remat boundary cannot occur
        return jax.checkpoint(f, prevent_cse=False)(
            params, qstate, sinks, x, ctx.key)

    ResidualBlock.apply = remat_apply
    return orig_apply


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="int8-a8",
                    choices=list(_ib.CONFIGS))
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--unroll", type=int, default=4)
    args = ap.parse_args()
    cfg = _ib.CONFIGS[args.config]

    dt0 = _ib.measure(cfg, args.batch, args.unroll, 50, 224, 1000)
    print(f"baseline       {dt0 * 1e3:8.2f} ms/step "
          f"{args.batch / dt0:8.0f} img/s", flush=True)

    orig = patch_remat()
    try:
        dt1 = _ib.measure(cfg, args.batch, args.unroll, 50, 224, 1000)
    finally:
        ResidualBlock.apply = orig
    print(f"block-remat    {dt1 * 1e3:8.2f} ms/step "
          f"{args.batch / dt1:8.0f} img/s  ({dt0 / dt1:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
