"""Overhead-controlled reduce microbench: per-iteration scan overhead is
~1.7 ms on this backend (reduce_probe.py measured identical times for
51 MB and 206 MB reductions), so each body does K independent reduces and
the marginal cost is (t(K) - t(0)) / K."""

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

LIMIT = 128.0
K = 16


def timeit(fn, x, reps=3, inner=8):
    def block(x):
        def body(c, i):
            out = fn(x * (1.0 + i.astype(jnp.float32) * 1e-6))
            return c, out
        _, r = lax.scan(body, 0, jnp.arange(inner))
        return r[-1]

    bj = jax.jit(block)
    float(bj(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(bj(x))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def none_(x):
    return x.ravel()[0]


def mean_masks(x):
    acc = x.ravel()[0] * 0
    for j in range(K):
        scaled = x * (2.0 + j)
        over = jnp.logical_or(scaled >= LIMIT, scaled < -LIMIT)
        over2 = jnp.logical_or(scaled >= LIMIT / 2, scaled < -LIMIT / 2)
        acc += (jnp.mean(over.astype(jnp.float32))
                + jnp.mean(over2.astype(jnp.float32)))
    return acc


def minmax(x):
    acc = x.ravel()[0] * 0
    for j in range(K):
        scaled = x * (2.0 + j)
        amax = jnp.max(scaled)
        amin = jnp.min(scaled)
        over = jnp.logical_or(amax >= LIMIT, amin < -LIMIT)
        over2 = jnp.logical_or(amax >= LIMIT / 2, amin < -LIMIT / 2)
        acc += over.astype(jnp.float32) + over2.astype(jnp.float32)
    return acc


if __name__ == "__main__":
    for shape in ((64, 56, 56, 64), (64, 14, 14, 1024)):
        n = 1
        for d in shape:
            n *= d
        x = jax.random.normal(jax.random.key(0), shape, jnp.float32) * 40
        gbs = n * 4 / 1e9
        t_none = timeit(none_, x)
        print(f"shape {shape} ({gbs * 1e3:.0f} MB)  overhead "
              f"{t_none * 1e6:.0f} us")
        for name, fn in [("mean-masks", mean_masks), ("minmax", minmax)]:
            dt = timeit(fn, x)
            per = (dt - t_none) / K
            print(f"  {name:12s} {per * 1e6:9.1f} us/site  "
                  f"{gbs / per:7.1f} GB/s", flush=True)
