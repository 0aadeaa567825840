"""Microbench: overflow-stat reduction variants on TPU.

The profiled ResNet-50 step spends ~60% of device time in
convert_reduce fusions — the per-site overflow-rate reductions of the
DFXP range controllers (benchmarks/profile_step.py).  This measures
alternatives on a representative activation tensor.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lbt_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, reps=3, inner=16):
    def block(*a):
        def body(c, _):
            out = fn(*a)
            return c, out.ravel()[0].astype(jnp.float32)
        _, r = lax.scan(body, 0, None, length=inner)
        return r[-1]

    bj = jax.jit(block)
    float(bj(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(bj(*args))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


LIMIT = 128.0


def v0_mean_masks(x):
    scaled = x * 2.0
    over = jnp.logical_or(scaled >= LIMIT, scaled < -LIMIT)
    over2 = jnp.logical_or(scaled >= LIMIT / 2, scaled < -LIMIT / 2)
    return jnp.stack([jnp.mean(over.astype(jnp.float32)),
                      jnp.mean(over2.astype(jnp.float32))])


def v1_minmax(x):
    scaled = x * 2.0
    amax = jnp.max(scaled)
    amin = jnp.min(scaled)
    over = jnp.logical_or(amax >= LIMIT, amin < -LIMIT)
    over2 = jnp.logical_or(amax >= LIMIT / 2, amin < -LIMIT / 2)
    return jnp.stack([over, over2]).astype(jnp.float32)


def v2_single_max(x):
    # one reduce over a transformed value; asymmetric boundary handled by
    # mapping negatives through nextafter
    scaled = x * 2.0
    t = jnp.maximum(scaled, jnp.nextafter(-scaled, -jnp.inf))
    m = jnp.max(t)
    return jnp.stack([m >= LIMIT, m >= LIMIT / 2]).astype(jnp.float32)


def v3_staged_minmax(x):
    # explicit two-stage: per-row partials then tiny scalar reduce
    scaled = (x * 2.0).reshape(-1, 4096)
    amax = jnp.max(jnp.max(scaled, axis=1))
    amin = jnp.min(jnp.min(scaled, axis=1))
    over = jnp.logical_or(amax >= LIMIT, amin < -LIMIT)
    over2 = jnp.logical_or(amax >= LIMIT / 2, amin < -LIMIT / 2)
    return jnp.stack([over, over2]).astype(jnp.float32)


def v4_mean_via_dot(x):
    # mask sums on the MXU: mask @ ones
    scaled = (x * 2.0).reshape(-1, 4096)
    over = jnp.logical_or(scaled >= LIMIT, scaled < -LIMIT)
    over2 = jnp.logical_or(scaled >= LIMIT / 2, scaled < -LIMIT / 2)
    both = jnp.stack([over, over2], -1).astype(jnp.bfloat16)
    ones = jnp.ones((4096,), jnp.bfloat16)
    part = jnp.einsum("rce,c->re", both, ones,
                      preferred_element_type=jnp.float32)
    return jnp.sum(part, axis=0) / scaled.size


if __name__ == "__main__":
    for shape in ((64, 56, 56, 64), (64, 112, 112, 64), (64, 14, 14, 1024)):
        n = 1
        for d in shape:
            n *= d
        x = jax.random.normal(jax.random.key(0), shape, jnp.float32) * 40
        gbs = n * 4 / 1e9
        print(f"shape {shape}  ({gbs * 1e3:.0f} MB)")
        for name, fn in [("v0 mean-masks", v0_mean_masks),
                         ("v1 min/max", v1_minmax),
                         ("v2 single-max", v2_single_max),
                         ("v3 staged minmax", v3_staged_minmax),
                         ("v4 dot-sum", v4_mean_via_dot)]:
            dt = timeit(fn, x)
            print(f"  {name:18s} {dt * 1e6:9.1f} us  "
                  f"{gbs / dt:7.1f} GB/s", flush=True)
