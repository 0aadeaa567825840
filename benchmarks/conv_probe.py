"""Honest isolated conv timing: genuinely sequential chain.

Every earlier micro-probe here was invalidated by some XLA legality:
independent per-iteration outputs let the loop compute only the last
consumed one; ``z[j,j]`` consumption shrinks a matmul to a dot; repeated
ops CSE.  This probe threads the conv output through the scan CARRY, so
iteration i+1's input depends on iteration i's output — nothing can be
skipped.  Per-iteration cost = one conv + one cheap requant (subtract
via the 2-convs-per-iteration variant).
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


def _requant(z, dt_in):
    if dt_in == jnp.int8:
        return jnp.clip(z // 128, -127, 127).astype(jnp.int8)
    return (z * jnp.float32(1e-2)).astype(dt_in)


def chain(k, dt_in, dt_acc):
    def block(x, w):
        def body(x, _):
            for _ in range(k):
                z = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=dt_acc)
                x = _requant(z, dt_in)
            return x, ()
        x, _ = lax.scan(body, x, None, length=8)
        return x.astype(jnp.float32).max()
    return block


def _rand(shape, dt, key):
    if dt == jnp.int8:
        return jax.random.randint(key, shape, -4, 4, jnp.int8)
    return (jax.random.normal(key, shape) * 0.1).astype(dt)


def run(hw, cin, cout, dt_in, dt_acc, nm, b=64):
    x = _rand((b, hw, hw, cin), dt_in, jax.random.key(0))
    w = _rand((3, 3, cin, cout), dt_in, jax.random.key(1))
    times = {}
    for k in (1, 3):
        bj = jax.jit(chain(k, dt_in, dt_acc))
        float(bj(x, w))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(bj(x, w))
            best = min(best, (time.perf_counter() - t0) / 8)
        times[k] = best
    per = (times[3] - times[1]) / 2
    fl = 2 * b * hw * hw * cin * cout * 9
    print(f"conv {b}x{hw}x{hw}x{cin}->{cout} k3 {nm:5s} "
          f"conv+requant {per * 1e3:7.3f} ms  {fl / per / 1e12:6.1f} TOP/s"
          f"   (t1 {times[1] * 1e3:6.2f} t3 {times[3] * 1e3:6.2f})",
          flush=True)


if __name__ == "__main__":
    for hw, c in ((28, 128), (56, 64), (14, 256)):
        for dt_in, dt_acc, nm in ((jnp.bfloat16, jnp.float32, "bf16"),
                                  (jnp.int8, jnp.int32, "int8")):
            run(hw, c, c, dt_in, dt_acc, nm)
