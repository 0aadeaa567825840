"""Marginal op costs on this backend, overhead-controlled.

Microbenching through the tunneled chip is a minefield; this probe
exists mostly to document the pitfalls (and the profiler-based
benchmarks/profile_step.py is the trustworthy tool):

* one op per scan iteration measures a ~1.4-3 ms per-iteration floor of
  this backend, not the op -> each body runs K ops and the marginal
  cost is (t(K) - t(1)) / (K - 1);
* consuming ``z[j, j]`` lets XLA's algebraic simplifier rewrite a whole
  matmul into one row-column dot -> consume outputs fully (``z.max()``);
* K "different" ops built from the same inputs get CSE'd -> each op's
  input must depend on the previous op's output (chained below; the
  marginal therefore includes one convert+scale per op, a small
  bandwidth-bound addend).
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


def timeit(make_body, args, inner=8, reps=3):
    def block(*a):
        def body(c, i):
            return c, make_body(i, *a)
        _, r = lax.scan(body, 0, jnp.arange(inner))
        return r[-1]

    bj = jax.jit(block)
    float(bj(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(bj(*args))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def _requant(z, dt_in):
    """Chain an op output back to an input tensor (defeats CSE)."""
    if dt_in == jnp.int8:
        return jnp.clip(z % 251 - 125, -127, 127).astype(jnp.int8)
    return (z * 1e-3).astype(dt_in)


def mm_body(k, dt_in, dt_acc):
    def body(i, x):
        acc = jnp.float32(0)
        y = x
        for _ in range(k):
            z = lax.dot_general(
                y, y, (((1,), (0,)), ((), ())),
                preferred_element_type=dt_acc)
            acc += z.max().astype(jnp.float32)
            y = _requant(z, dt_in)
        return acc + i
    return body


def conv_body(k, dt_in, dt_acc):
    def body(i, x, w):
        acc = jnp.float32(0)
        y = x
        for _ in range(k):
            z = lax.conv_general_dilated(
                y, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt_acc)
            acc += z.max().astype(jnp.float32)
            y = _requant(z, dt_in)
        return acc + i
    return body


def marginal(name, mk, args, fl):
    t1 = timeit(mk(1), args)
    t5 = timeit(mk(5), args)
    m = (t5 - t1) / 4
    print(f"{name:40s} marginal {m * 1e3:7.3f} ms  "
          f"{fl / m / 1e12:7.1f} TOP/s   (t1 {t1 * 1e3:6.2f} ms)",
          flush=True)


def _rand(shape, dt, key):
    if dt == jnp.int8:
        return jax.random.randint(key, shape, -127, 127, jnp.int8)
    return jax.random.normal(key, shape).astype(dt)


if __name__ == "__main__":
    n = 4096
    for dt_in, dt_acc, nm in ((jnp.bfloat16, jnp.float32, "bf16"),
                              (jnp.int8, jnp.int32, "int8")):
        x = _rand((n, n), dt_in, jax.random.key(0))
        marginal(f"matmul {n}^3 {nm}",
                 lambda k, d=dt_in, a=dt_acc: mm_body(k, d, a), (x,),
                 2 * n ** 3)
    for hw, c in ((28, 128), (56, 64), (14, 256)):
        for dt_in, dt_acc, nm in ((jnp.bfloat16, jnp.float32, "bf16"),
                                  (jnp.int8, jnp.int32, "int8")):
            x = _rand((64, hw, hw, c), dt_in, jax.random.key(0))
            w = _rand((3, 3, c, c), dt_in, jax.random.key(1))
            marginal(f"conv 64x{hw}x{hw}x{c}->{c} k3 {nm}",
                     lambda k, d=dt_in, a=dt_acc: conv_body(k, d, a),
                     (x, w), 2 * 64 * hw * hw * c * c * 9)
