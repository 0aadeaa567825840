"""Golden tests for the DFXP quantizer core vs the NumPy oracle
(reference semantics, /root/reference/dynamic_fixed_point.py:4-94)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbt_tpu.dfxp import (
    overflow_rates,
    quantize,
    quantize_int,
    quantize_ste,
    update_exponent,
)


@pytest.mark.parametrize("bits", [2, 4, 8, 9, 16])
@pytest.mark.parametrize("exp", [-3, 0, 2, 7])
def test_quantize_matches_oracle(bits, exp):
    if exp > bits - 1:
        pytest.skip("exponent above reference clamp")
    rng = np.random.default_rng(0)
    x = rng.normal(0, 2.0, (64, 17)).astype(np.float32)
    got = np.asarray(quantize(x, bits, jnp.int32(exp)))
    want = oracle.quantize(x, bits, exp)
    np.testing.assert_array_equal(got, want)


def test_bits32_passthrough():
    x = np.random.default_rng(1).normal(size=(10, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(quantize(x, 32, jnp.int32(2))), x)


def test_clip_boundaries():
    # 8 bits, exp 2: mult = 2**5 = 32, codes in [-128, 127]
    x = np.array([-100.0, -4.0, 3.96875, 3.97, 100.0], np.float32)
    got = np.asarray(quantize(x, 8, jnp.int32(2)))
    assert got[0] == -4.0          # clipped to -128/32
    assert got[1] == -4.0
    assert got[2] == 3.96875       # 127/32, exactly representable
    assert got[3] == 3.96875       # clipped to 127/32
    assert got[4] == 3.96875


def test_round_half_even():
    # codes at half-grid points round to even, as tf.round/np.round do
    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5], np.float32)
    got = np.asarray(quantize(x, 8, jnp.int32(7)))  # mult = 1
    np.testing.assert_array_equal(got, [0.0, 2.0, 2.0, -0.0, -2.0])


def test_negative_exponent_subunit_range():
    # exp can go negative: range shrinks below 1 (no lower clamp in the
    # reference, dynamic_fixed_point.py:94)
    x = np.array([0.1, 0.26, -0.3], np.float32)
    got = np.asarray(quantize(x, 4, jnp.int32(-2)))
    want = oracle.quantize(x, 4, -2)
    np.testing.assert_array_equal(got, want)


def test_quantize_int_codes():
    x = np.array([0.99, -1.0, 0.03125], np.float32)
    codes, mult = quantize_int(x, 8, jnp.int32(2))
    assert float(mult) == 32.0
    np.testing.assert_array_equal(np.asarray(codes), [32, -32, 1])


def test_stochastic_unbiased_and_deterministic_under_key():
    x = np.full((2048, 16), 0.33, np.float32)
    key = jax.random.key(3)
    q1 = np.asarray(quantize(x, 8, jnp.int32(2), key, stochastic=True))
    q2 = np.asarray(quantize(x, 8, jnp.int32(2), key, stochastic=True))
    np.testing.assert_array_equal(q1, q2)  # same key -> same result
    # E[q(x)] ~= x
    assert abs(q1.mean() - 0.33) < 2e-3
    # values lie on the grid
    assert np.all(np.abs(np.round(q1 * 32) - q1 * 32) < 1e-6)


def test_stochastic_matches_oracle_given_noise():
    # jax and oracle agree when fed identical noise
    x = np.random.default_rng(5).normal(0, 2, (32, 8)).astype(np.float32)
    key = jax.random.key(9)
    u = np.asarray(jax.random.uniform(key, x.shape, jnp.float32))
    want = oracle.quantize_stochastic(x, 8, 2, u)
    # reproduce what quantize() does internally with the same key
    got = np.asarray(quantize(x, 8, jnp.int32(2), key, stochastic=True))
    np.testing.assert_array_equal(got, want)


def test_noise_shared_axis0():
    # reference quirk: noise drawn with shape x.shape[1:] (reference
    # dynamic_fixed_point.py:36) -> same noise for every row
    x = np.tile(np.random.default_rng(6).normal(0, 1, (1, 64)), (4, 1))
    x = x.astype(np.float32)
    got = np.asarray(
        quantize(x, 8, jnp.int32(2), jax.random.key(0), stochastic=True,
                 noise_shared_axis0=True))
    for i in range(1, 4):
        np.testing.assert_array_equal(got[0], got[i])


def test_ste_gradient_identity():
    x = jnp.linspace(-5, 5, 31)

    def f(x):
        return jnp.sum(quantize_ste(x, 8, jnp.int32(2)) * 3.0)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)


def test_overflow_rates_match_oracle():
    rng = np.random.default_rng(7)
    for exp in (-1, 0, 2, 5):
        x = rng.normal(0, 3.0, (256,)).astype(np.float32)
        got = np.asarray(overflow_rates(x, 8, jnp.int32(exp)))
        want = oracle.overflow_rates(x, 8, exp)
        np.testing.assert_allclose(got, want, atol=1e-7)


def test_overflow_stats_decision_equivalent():
    """overflow_stats (the fast min/max indicator form used at the default
    target 0) must drive update_exponent to the exact same exponent as the
    oracle's mean-of-mask rates, including exact boundary values
    (scaled == +-limit, +-limit/2)."""
    from lbt_tpu.dfxp.quantize import overflow_stats

    rng = np.random.default_rng(11)
    bits = 8
    cases = [rng.normal(0, s, (97,)).astype(np.float32)
             for s in (0.01, 0.5, 1.0, 4.0, 64.0)]
    # boundary values at exp=2: mult = 2**(8-1-2) = 32, limit = 128
    # scaled = x*32 -> x = 4.0 gives scaled == limit (overflow, >=)
    # x = -4.0 gives scaled == -limit (NOT overflow, < is strict)
    # x = 2.0 / -2.0 hit the half-range boundary the same way
    cases += [np.array([4.0], np.float32), np.array([-4.0], np.float32),
              np.array([2.0], np.float32), np.array([-2.0], np.float32),
              np.array([3.999, -3.999], np.float32)]
    for x in cases:
        for exp in (-1, 0, 2, 5):
            fast = overflow_stats(jnp.asarray(x), bits, jnp.int32(exp), 0.0)
            ovf, ovf2 = oracle.overflow_rates(x, bits, exp)
            want = oracle.update_exponent(exp, ovf, ovf2, bits)
            got = int(update_exponent(jnp.int32(exp), fast, bits, 0.0))
            assert got == want, (x[:4], exp, np.asarray(fast), (ovf, ovf2))


def test_overflow_stats_nonzero_target_falls_back():
    from lbt_tpu.dfxp.quantize import overflow_stats

    rng = np.random.default_rng(3)
    x = rng.normal(0, 3.0, (256,)).astype(np.float32)
    got = np.asarray(overflow_stats(jnp.asarray(x), 8, jnp.int32(2), 0.01))
    want = oracle.overflow_rates(x, 8, 2)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_controller_truth_table():
    # widen on any overflow; tighten only if halving is lossless; else hold
    cases = [
        ((0.1, 0.5), +1),   # overflow > 0 -> widen
        ((0.0, 0.0), -1),   # no overflow even at half range -> tighten
        ((0.0, 0.2), 0),    # would overflow at half range -> hold
    ]
    for (ovf, ovf2), delta in cases:
        new = update_exponent(
            jnp.int32(3), jnp.array([ovf, ovf2], jnp.float32), 8, 0.0)
        assert int(new) == 3 + delta, (ovf, ovf2)


def test_controller_upper_clamp():
    new = update_exponent(
        jnp.int32(7), jnp.array([1.0, 1.0], jnp.float32), 8, 0.0)
    assert int(new) == 7  # bits-1 clamp (reference :94)


def test_controller_target_rate():
    rates = jnp.array([0.02, 0.05], jnp.float32)
    assert int(update_exponent(jnp.int32(0), rates, 8, 0.1)) == -1
    assert int(update_exponent(jnp.int32(0), rates, 8, 0.03)) == 0
    assert int(update_exponent(jnp.int32(0), rates, 8, 0.01)) == 1


# ---------------------------------------------------------------------------
# hash-noise fast path (noise_mode='hash', backend='xla_hash')
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("light", [False, True])
def test_hash_noise_uniformity(light):
    from lbt_tpu.dfxp.quantize import _hash_uniform
    u = np.asarray(_hash_uniform(jax.random.key(3), (1 << 16,), light))
    assert u.min() >= 0.0 and u.max() < 1.0
    np.testing.assert_allclose(u.mean(), 0.5, atol=5e-3)
    np.testing.assert_allclose(u.var(), 1.0 / 12.0, atol=5e-3)
    # adjacent-element and lagged correlation must be negligible
    for lag in (1, 2, 128):
        c = np.corrcoef(u[:-lag], u[lag:])[0, 1]
        assert abs(c) < 0.02, (lag, c)
    # equidistribution across 256 bins (chi-square well under blowup)
    counts = np.bincount((u * 256).astype(np.int64), minlength=256)
    expected = u.size / 256
    chi2 = ((counts - expected) ** 2 / expected).sum()
    assert chi2 < 400, chi2  # dof=255, p~1e-8 cutoff


def test_hash1_stochastic_rounding_unbiased():
    # the single-round hash (noise_mode='hash1') must stay unbiased:
    # E_key[q(x)] -> x for values strictly inside the grid
    x = np.linspace(-1.9, 1.9, 257).astype(np.float32)
    acc = np.zeros_like(x, np.float64)
    n = 200
    for i in range(n):
        acc += np.asarray(quantize(
            x, 8, jnp.int32(2), jax.random.key(i), stochastic=True,
            backend="xla_hash1"))
    step = 2.0 ** -(8 - 1 - 2)
    np.testing.assert_allclose(acc / n, x, atol=0.3 * step)


@pytest.mark.parametrize("light", [False, True])
def test_hash_noise_keys_decorrelate(light):
    from lbt_tpu.dfxp.quantize import hash_uniform
    u1 = np.asarray(hash_uniform(jax.random.key(0), (4096,), light=light))
    u2 = np.asarray(hash_uniform(jax.random.key(1), (4096,), light=light))
    np.testing.assert_array_equal(
        u1, np.asarray(hash_uniform(jax.random.key(0), (4096,),
                                    light=light)))
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.05


def test_hash_stochastic_rounding_unbiased():
    # E_key[q(x)] -> x for values strictly inside the grid
    x = np.linspace(-1.9, 1.9, 257).astype(np.float32)
    acc = np.zeros_like(x, np.float64)
    n = 200
    for i in range(n):
        acc += np.asarray(quantize(
            x, 8, jnp.int32(2), jax.random.key(i), stochastic=True,
            backend="xla_hash"))
    step = 2.0 ** -(8 - 1 - 2)
    np.testing.assert_allclose(acc / n, x, atol=0.3 * step)


def test_hash_backend_matches_xla_when_deterministic():
    x = np.random.default_rng(11).normal(0, 1, (64, 64)).astype(np.float32)
    a = np.asarray(quantize(x, 8, jnp.int32(2), backend="xla"))
    b = np.asarray(quantize(x, 8, jnp.int32(2), backend="xla_hash"))
    np.testing.assert_array_equal(a, b)


def test_code_storage_dtype_narrow_and_exact():
    """Codes are stored at the narrowest exact dtype (int8 for <=8 bits,
    bf16 for the 9-bit conv-activation case, int16 for <=16): integer
    codes materialize in HBM and ride custom_vjp residuals, so int32
    storage would cost 4x the bandwidth."""
    from lbt_tpu.dfxp.quantize import code_dtype

    assert code_dtype(8) == jnp.int8
    assert code_dtype(9) == jnp.bfloat16
    assert code_dtype(12) == jnp.int16
    assert code_dtype(24) == jnp.int32

    # 8-bit extremes land exactly on int8 limits
    x = jnp.array([-1000.0, -1.0, 0.3, 1000.0], jnp.float32)
    codes, mult = quantize_int(x, 8, jnp.int32(2))
    assert codes.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(codes, np.int32),
        [-128, -32, round(0.3 * 32), 127])

    # 9-bit codes span [-256, 255]; every integer there is exact in bf16
    codes9, mult9 = quantize_int(x, 9, jnp.int32(2))
    assert codes9.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(codes9, np.float32), [-256.0, -64.0, 19.0, 255.0])
    all_codes = jnp.arange(-256, 256, dtype=jnp.float32)
    assert np.array_equal(np.asarray(all_codes.astype(jnp.bfloat16),
                                     np.float32),
                          np.asarray(all_codes))


def test_stochastic_sub_lsb_noise_scale():
    """Stochastic rounding of sub-LSB values is unbiased but injects
    noise of LSB scale, NOT signal scale: rms(q - x) ~ sqrt(LSB*E|x|)
    >> rms(x) when the exponent is far above the data.  This is the
    mechanism behind the ImageNet grad-exponent cold-start collapse
    (QuantConfig.initial_exponent_g, config.py): cotangents ~1e-4 on
    the reference init-2 grid (LSB = 2^2/128 = 1/32) come out as sparse
    +/-1/32 spikes ~18x their own rms."""
    from lbt_tpu.dfxp.quantize import quantize

    key = jax.random.key(7)
    x = jax.random.normal(jax.random.key(1), (4096,)) * 1e-4
    rms = lambda v: float(jnp.sqrt(jnp.mean(jnp.square(v))))

    q_hot = quantize(x, 8, jnp.int32(2), key, stochastic=True)
    err_hot = rms(q_hot - x)
    # noise ~ sqrt(LSB * E|x|) = sqrt(0.03125 * 8e-5) ~ 1.6e-3 >> 1e-4
    assert err_hot > 8.0 * rms(x), (err_hot, rms(x))
    # unbiased all the same (mean error -> 0)
    assert abs(float(jnp.mean(q_hot - x))) < 5.0 * err_hot / 64.0

    # on a grid that covers the data (exp -10: LSB = 2^-10/128 = 7.6e-6)
    # the error drops BELOW the signal
    q_cold = quantize(x, 8, jnp.int32(-10), key, stochastic=True)
    err_cold = rms(q_cold - x)
    assert err_cold < 0.1 * rms(x), (err_cold, rms(x))
