"""Microbench: practical MXU peak through this backend, by dtype.

Times big matmuls and a ResNet-50 stage conv at f32/bf16/int8 to locate
the hardware ceiling that the train-step numbers should be compared
against (readback-forced, scan-amortized — see BENCH_NOTES.md).
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


def timeit(fn, *args, reps=3, inner=8):
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


def mm(dt_in, dt_acc, n=4096):
    a = jnp.ones((n, n), dt_in)
    b = jnp.ones((n, n), dt_in)
    dt = timeit(lambda x, y: lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=dt_acc), a, b)
    fl = 2 * n ** 3
    print(f"matmul {n} {dt_in.__name__:9s}->{dt_acc.__name__:8s} "
          f"{dt * 1e3:7.3f} ms  {fl / dt / 1e12:7.1f} TOP/s", flush=True)


def conv(dt_in, dt_acc, b=64, hw=28, cin=128, cout=128, k=3):
    x = jnp.ones((b, hw, hw, cin), dt_in)
    w = jnp.ones((k, k, cin, cout), dt_in)
    dt = timeit(lambda x, y: lax.conv_general_dilated(
        x, y, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt_acc), x, w)
    fl = 2 * b * hw * hw * cin * cout * k * k
    print(f"conv {b}x{hw}x{hw}x{cin}->{cout} k{k} "
          f"{dt_in.__name__:9s}->{dt_acc.__name__:8s} "
          f"{dt * 1e3:7.3f} ms  {fl / dt / 1e12:7.1f} TOP/s", flush=True)


if __name__ == "__main__":
    for dt_in, dt_acc in ((jnp.float32, jnp.float32),
                          (jnp.bfloat16, jnp.float32),
                          (jnp.int8, jnp.int32)):
        mm(dt_in, dt_acc)
    for dt_in, dt_acc in ((jnp.float32, jnp.float32),
                          (jnp.bfloat16, jnp.float32),
                          (jnp.int8, jnp.int32)):
        conv(dt_in, dt_acc)
    # ResNet-50 hot convs: stage-3 56x56x64->64 and stage-4 14x14x256
    for dt_in, dt_acc in ((jnp.bfloat16, jnp.float32),
                          (jnp.int8, jnp.int32)):
        conv(dt_in, dt_acc, b=64, hw=56, cin=64, cout=64)
        conv(dt_in, dt_acc, b=64, hw=14, cin=256, cout=256)
