"""DFXP quantization primitives (pure JAX, jit-safe).

Semantics re-derived from the reference implementation
(/root/reference/dynamic_fixed_point.py:4-94) but expressed functionally:

* A tensor is quantized to a ``bits``-wide signed fixed-point grid whose
  binary point sits at ``exp`` integer bits (excluding sign):
  ``multiplier = 2**(bits - exp - 1)``; codes are clipped to
  ``[-2**(bits-1), 2**(bits-1) - 1]``.
* Deterministic rounding is round-half-to-even (``tf.round`` == ``jnp.round``).
* Stochastic rounding is ``floor(x * multiplier + U[0,1))`` with the clip
  applied around the noisy value, exactly as reference
  dynamic_fixed_point.py:32-38.  By default noise is drawn per element;
  the reference's quirk of sharing one noise sample across the leading
  axis (noise shape ``X.shape[1:]``) is available via
  ``noise_shared_axis0=True``.
* ``bits >= 32`` is an exact passthrough (reference :22-23).
* The overflow controller (reference :70-94) is a pure function
  ``update_exponent``: it measures the overflow rate of the *pre-quantized*
  float tensor at the current exponent and steps the exponent by +-1.
  The upper clamp ``exp <= bits - 1`` is the reference's; we additionally
  clamp below at ``EXP_MIN`` because ``2.0**(bits-exp-1)`` overflows float32
  beyond that point in the reference too (it would produce inf there).

Exponent convention: ``exp`` is the reference's ``integer_bits`` — the
number of integer bits excluding sign.  Larger ``exp`` = wider range,
coarser resolution.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes

# Below this exponent the float32 multiplier 2**(bits-1-exp) would overflow;
# the reference would silently produce inf (tf.cast(2**k, tf.float32)).
EXP_MIN = -110


def multiplier(bits: int, exp: jax.Array) -> jax.Array:
    """2**(bits - 1 - exp) as an exact float32 power of two."""
    e = jnp.asarray(bits - 1, jnp.int32) - jnp.asarray(exp, jnp.int32)
    return jnp.ldexp(jnp.float32(1.0), e)


def wrap_key(data: jax.Array) -> jax.Array:
    """Reconstruct a typed PRNG key from raw key data.

    Keys are plumbed through custom_vjp boundaries as raw uint32 arrays
    (typed keys can't take float0 cotangents); the impl is recovered from
    the data width: (2,) -> threefry2x32, (4,) -> unsafe_rbg (the TPU
    hardware RNG, used for cheap stochastic-rounding noise).
    """
    impl = "threefry2x32" if data.shape[-1] == 2 else "unsafe_rbg"
    return jax.random.wrap_key_data(data, impl=impl)


def _hash_uniform(key: jax.Array, shape, light: bool = False) -> jax.Array:
    """Uniform [0,1) noise from a cheap counter hash (~10 VPU ops/word).

    Stochastic-rounding noise needs uniformity and decorrelation from the
    data, not cryptographic strength: XLA's threefry (~tens of VPU ops
    per word) dominates stochastic DFXP step time
    (benchmarks/BENCH_NOTES.md), so this path hashes a flat element
    counter with the key using the full-avalanche `lowbias32` integer
    finalizer.  Pure XLA ops: fuses into the surrounding quantize (no
    Pallas fusion break, no HBM round trip) and is bit-reproducible
    across CPU/TPU backends.

    ``light=True`` (noise_mode='hash1'): a single multiply-xorshift
    round (~5 VPU ops/word).  Each round is a bijection of the full
    uint32 counter domain, so over ALL 2^32 counters the output is
    exactly uniform; a real tensor uses only the 0..n-1 counter slice,
    where uniformity rests on the empirical equidistribution of the
    truncated multiply-xorshift (validated by the chi-square /
    unbiasedness / key-decorrelation tests in tests/test_quantize.py,
    parametrized over light), not on the bijection argument.  Avalanche
    is weaker than lowbias32 — more cross-element structure.
    Per-element and per-step independence of the *seed* is unchanged
    (fresh fold_in key per site per step), and accuracy parity is
    validated on the training harness (benchmarks/BENCH_NOTES.md).
    """
    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = kd[..., 0] + kd[..., -1] * jnp.uint32(0x9E3779B9)
    n = 1
    for d in shape:
        n *= d
    x = jax.lax.iota(jnp.uint32, max(n, 1)) ^ seed
    if light:
        # one multiply-xorshift round; seed re-mixed into the low bits
        x *= jnp.uint32(0x7FEB352D)
        x ^= x >> 15
        x *= jnp.uint32(0x846CA68B)
    else:
        # lowbias32 finalizer (avalanche-optimized xorshift-multiply)
        x ^= x >> 16
        x *= jnp.uint32(0x7FEB352D)
        x ^= x >> 15
        x *= jnp.uint32(0x846CA68B)
        x ^= x >> 16
    u = (x >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24)
    return u[:n].reshape(shape)


# Public alias: benchmarks use this for cheap on-device synthetic inputs
# (uniform [0,1) without billing threefry cost to the measured step).
hash_uniform = _hash_uniform


def _noise(key: jax.Array, shape, shared_axis0: bool,
           noise_bits: int = 24, fast: bool = False,
           light: bool = False) -> jax.Array:
    """Uniform [0,1) rounding noise.

    Float32-grade noise via jax.random.uniform (the reference's
    tf.random_uniform equivalent).  ``fast=True``: counter-hash noise
    (see :func:`_hash_uniform`); ``light=True`` selects its cheaper
    single-round variant.  (A former ``noise_bits=8`` packed-byte path
    was removed in round 5 — a documented negative on TPU, where the
    unpack's relayouts cost more than the threefry it saved.)
    """
    assert noise_bits >= 16, "packed sub-16-bit noise was removed (round 5)"
    if shared_axis0 and len(shape) >= 1:
        u = _noise(key, tuple(shape[1:]), False, noise_bits, fast, light)
        return jnp.broadcast_to(u, shape)
    if fast:
        return _hash_uniform(key, shape, light)
    return jax.random.uniform(key, shape, jnp.float32)


def code_dtype(bits: int):
    """Narrowest exact storage dtype for ``bits``-wide codes.

    int8 holds 8-bit codes; bfloat16 represents every integer with
    magnitude <= 256 exactly, covering the 9-bit conv-activation case
    (codes in [-256, 255]) at 2 bytes.  Narrow storage matters: codes are
    materialized in HBM and saved as custom_vjp residuals for the
    backward contractions, so int32 storage would cost 4x the bandwidth.
    """
    if bits <= 8:
        return jnp.int8
    if bits <= 9:
        return jnp.bfloat16
    if bits <= 16:
        return jnp.int16
    return jnp.int32


def quantize_int(
    x: jax.Array,
    bits: int,
    exp: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    stochastic: bool = False,
    noise_shared_axis0: bool = False,
    noise_bits: int = 24,
    backend: str = "xla",
) -> tuple[jax.Array, jax.Array]:
    """Quantize to integer codes.

    Returns ``(codes, multiplier)`` with ``dequantized = codes /
    multiplier`` and codes stored in :func:`code_dtype` (integer-valued;
    cast as needed).  ``bits`` must be < 32.

    ``backend='pallas'`` (TPU only; silently falls back elsewhere) runs
    the fused Pallas kernel with in-kernel hardware-PRNG stochastic
    rounding — with a different (but equally uniform) noise stream than
    the XLA threefry path.  ``backend='xla_hash'`` keeps the pure-XLA
    (fully fused) quantize but draws rounding noise from the cheap
    counter hash instead of threefry — the fast path;
    ``backend='xla_hash1'`` uses the still-cheaper single-round hash.
    """
    assert bits < 32, "quantize_int is only meaningful for bits < 32"
    if (backend == "pallas" and not noise_shared_axis0
            and jax.default_backend() == "tpu"):
        from lbt_tpu.ops.pallas import quantize_pallas
        seed = None
        if stochastic:
            if key is None:
                raise ValueError(
                    "stochastic quantization requires a PRNG key")
            kd = jax.random.key_data(key)
            seed = (kd[0] ^ kd[-1]).astype(jnp.int32)
        codes, mult = quantize_pallas(
            x.astype(jnp.float32), bits, exp, seed, stochastic=stochastic)
        return codes.astype(code_dtype(bits)), mult
    x = x.astype(jnp.float32)
    mult = multiplier(bits, exp)
    limit = float(2 ** (bits - 1))
    scaled = x * mult
    if stochastic:
        if key is None:
            raise ValueError("stochastic quantization requires a PRNG key")
        scaled = scaled + _noise(key, x.shape, noise_shared_axis0,
                                 noise_bits,
                                 fast=backend in ("xla_hash", "xla_hash1"),
                                 light=(backend == "xla_hash1"))
        codes = jnp.floor(jnp.clip(scaled, -limit, limit - 1))
    else:
        codes = jnp.round(jnp.clip(scaled, -limit, limit - 1))
    return codes.astype(code_dtype(bits)), mult


def dequantize(codes: jax.Array, mult: jax.Array) -> jax.Array:
    return codes.astype(jnp.float32) / mult


def quantize(
    x: jax.Array,
    bits: int,
    exp: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    stochastic: bool = False,
    noise_shared_axis0: bool = False,
    noise_bits: int = 24,
    backend: str = "xla",
) -> jax.Array:
    """Fake-quantize: quantize then dequantize, no STE (not differentiable
    in the STE sense — use :func:`quantize_ste` inside models)."""
    if bits >= 32:
        return x
    codes, mult = quantize_int(
        x, bits, exp, key,
        stochastic=stochastic, noise_shared_axis0=noise_shared_axis0,
        noise_bits=noise_bits, backend=backend,
    )
    return dequantize(codes, mult)


# ---------------------------------------------------------------------------
# Straight-through estimator
# ---------------------------------------------------------------------------

def _float0(x) -> np.ndarray:
    aval = jax.api_util.shaped_abstractify(x)
    return np.zeros(aval.shape, dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4, 5, 6))
def _quantize_ste(x, bits, exp, stochastic, noise_shared_axis0, noise_bits,
                  backend, keydata):
    key = None if keydata is None else wrap_key(keydata)
    return quantize(
        x, bits, exp, key,
        stochastic=stochastic, noise_shared_axis0=noise_shared_axis0,
        noise_bits=noise_bits, backend=backend,
    )


def _quantize_ste_fwd(x, bits, exp, stochastic, noise_shared_axis0,
                      noise_bits, backend, keydata):
    y = _quantize_ste(x, bits, exp, stochastic, noise_shared_axis0,
                      noise_bits, backend, keydata)
    return y, (exp, keydata)


def _quantize_ste_bwd(bits, stochastic, noise_shared_axis0, noise_bits,
                      backend, res, g):
    # STE: cotangent passes through untouched (reference
    # dynamic_fixed_point.py:30,38 `lambda dy: dy`).
    exp, keydata = res
    key_cot = None if keydata is None else _float0(keydata)
    return (g, _float0(exp), key_cot)


_quantize_ste.defvjp(_quantize_ste_fwd, _quantize_ste_bwd)


def quantize_ste(
    x: jax.Array,
    bits: int,
    exp: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    stochastic: bool = False,
    noise_shared_axis0: bool = False,
    noise_bits: int = 24,
    backend: str = "xla",
) -> jax.Array:
    """Fake-quantize with straight-through gradient (identity backward)."""
    if bits >= 32:
        return x
    keydata = None if key is None else jax.random.key_data(key)
    return _quantize_ste(x, bits, exp, stochastic, noise_shared_axis0,
                         noise_bits, backend, keydata)


# ---------------------------------------------------------------------------
# Overflow measurement + dynamic range controller
# ---------------------------------------------------------------------------

def overflow_rates(x: jax.Array, bits: int, exp: jax.Array) -> jax.Array:
    """Fraction of elements clipping at the current range and at half range.

    Returns a float32 ``(2,)`` array ``[overflow(x), overflow(2x)]``
    (reference dynamic_fixed_point.py:48-67): element overflows when
    ``x * multiplier >= limit`` or ``< -limit``; the half-range mask uses
    ``limit / 2``.
    """
    x = x.astype(jnp.float32)
    mult = multiplier(bits, exp)
    limit = float(2 ** (bits - 1))
    scaled = x * mult
    over = jnp.logical_or(scaled >= limit, scaled < -limit)
    over2 = jnp.logical_or(scaled >= limit / 2, scaled < -limit / 2)
    return jnp.stack([
        jnp.mean(over.astype(jnp.float32)),
        jnp.mean(over2.astype(jnp.float32)),
    ])


def overflow_stats(
    x: jax.Array, bits: int, exp: jax.Array,
    target_overflow_rate: float = 0.0,
) -> jax.Array:
    """Overflow statistics sufficient for :func:`update_exponent`.

    For the default ``target_overflow_rate == 0`` (every call site in the
    reference — SURVEY.md §5.6) the controller's decisions depend only on
    *whether any* element clips at the current / half range, never on the
    exact fraction, so a min+max pair over the scaled tensor replaces the
    two mean-of-mask reductions: ``any(scaled >= limit) == (max(scaled) >=
    limit)`` and ``any(scaled < -limit) == (min(scaled) < -limit)``.  The
    returned indicator vector feeds :func:`update_exponent` unchanged
    (``ind > 0`` == "some overflow", ``ind <= 0`` == "none"), including
    under a data-parallel ``pmean`` (mean of indicators is positive iff
    any shard overflows).  Profiling showed these controller reductions at
    ~60% of ResNet-50 step device time (benchmarks/profile_step.py); the
    indicator form avoids the bool->f32 convert work and halves the
    reduction arity.  Divergence: with NaNs present among finite
    overflowing values the indicator path reads the NaN comparison as
    "no overflow" for the whole tensor where the mean path would still
    count the finite ones — by then training has already diverged.

    Non-zero targets need the true fractions: falls back to
    :func:`overflow_rates`.
    """
    if target_overflow_rate != 0.0:
        return overflow_rates(x, bits, exp)
    x = x.astype(jnp.float32)
    mult = multiplier(bits, exp)
    limit = float(2 ** (bits - 1))
    scaled = x * mult
    amax = jnp.max(scaled)
    amin = jnp.min(scaled)
    over = jnp.logical_or(amax >= limit, amin < -limit)
    over2 = jnp.logical_or(amax >= limit / 2, amin < -limit / 2)
    return jnp.stack([over, over2]).astype(jnp.float32)


def update_exponent(
    exp: jax.Array,
    rates: jax.Array,
    bits: int,
    target_overflow_rate: float = 0.0,
) -> jax.Array:
    """One controller step on a tensor's exponent.

    ``rates`` is the output of :func:`overflow_rates` measured on the
    pre-quantization float tensor at the *current* exponent.  Truth table
    (reference dynamic_fixed_point.py:84-94):

    * ``overflow(x) > target``  -> widen  (exp + 1)
    * ``overflow(2x) <= target`` -> tighten (exp - 1)
    * otherwise                 -> hold
    """
    ovf, ovf2 = rates[..., 0], rates[..., 1]
    delta = jnp.where(
        ovf > target_overflow_rate,
        jnp.int32(1),
        jnp.where(ovf2 <= target_overflow_rate, jnp.int32(-1), jnp.int32(0)),
    )
    return jnp.clip(exp.astype(jnp.int32) + delta, EXP_MIN, bits - 1)
