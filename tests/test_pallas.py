"""Pallas kernels vs the lax reference path (interpret mode on CPU,
compiled on TPU; SURVEY.md §4 kernel-test strategy)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbt_tpu.dfxp.quantize import quantize_int

_interpret = jax.devices()[0].platform != "tpu"


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    if _interpret:
        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


def test_quantize_pallas_deterministic_matches_reference():
    from lbt_tpu.ops.pallas import quantize_pallas
    x = np.random.default_rng(0).normal(0, 2, (33, 70)).astype(np.float32)
    codes, mult = quantize_pallas(x, 8, jnp.int32(2), stochastic=False)
    ref_codes, ref_mult = quantize_int(x, 8, jnp.int32(2))
    assert codes.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(codes, np.int32), np.asarray(ref_codes))
    assert float(mult) == float(ref_mult)


@pytest.mark.skipif(
    _interpret,
    reason="interpret mode stubs pltpu.prng_random_bits to zeros")
def test_quantize_pallas_stochastic_statistics():
    from lbt_tpu.ops.pallas import quantize_pallas
    x = np.full((256, 128), 0.33, np.float32)
    codes, mult = quantize_pallas(
        x, 8, jnp.int32(2), seed=jnp.int32(7), stochastic=True)
    vals = np.asarray(codes, np.float32) / float(mult)
    # stochastic rounding between the two neighboring grid points
    grid = np.unique(vals)
    assert len(grid) <= 2
    assert abs(vals.mean() - 0.33) < 2e-3
    # deterministic under the same seed
    codes2, _ = quantize_pallas(
        x, 8, jnp.int32(2), seed=jnp.int32(7), stochastic=True)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))


def test_qmatmul_pallas_matches_int8_reference():
    from lbt_tpu.ops.pallas import qmatmul_pallas
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1.5, (130, 100)).astype(np.float32)
    w = rng.normal(0, 0.5, (100, 70)).astype(np.float32)
    y = qmatmul_pallas(x, w, jnp.int32(2), jnp.int32(1),
                       bits_x=8, bits_w=8)
    xc, mx = quantize_int(x, 8, jnp.int32(2))
    wc, mw = quantize_int(w, 8, jnp.int32(1))
    want = (xc.astype(np.float32) @ wc.astype(np.float32)) / (
        float(mx) * float(mw))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_conv3x3_fused_matches_reference():
    """Fused conv+epilogue kernel vs the lax chain: conv(int8) ->
    dequant -> min/max -> round-quantize -> moments (deterministic
    path; the stochastic path is TPU-only, see the bench)."""
    from lbt_tpu.ops.pallas.conv_kernels import conv3x3_fused_int8
    rng = np.random.default_rng(3)
    b, h, w, c, k = 8, 6, 7, 128, 128
    xq = rng.integers(-8, 8, (b, h, w, c)).astype(np.int8)
    wq = rng.integers(-8, 8, (3, 3, c, k)).astype(np.int8)
    inv = jnp.float32(1.0 / 1024.0)
    mult = jnp.float32(32.0)

    yq, mom, mm = conv3x3_fused_int8(
        jnp.asarray(xq), jnp.asarray(wq), inv, mult, jnp.int32(0),
        bits_out=8, stochastic=False)

    y_ref = jax.lax.conv_general_dilated(
        xq.astype(np.float32), wq.transpose(0, 1, 2, 3).astype(np.float32),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_ref = np.asarray(y_ref) * float(inv)
    q_ref = np.clip(np.round(y_ref * float(mult)), -128, 127)

    np.testing.assert_array_equal(np.asarray(yq, np.int32),
                                  q_ref.astype(np.int32))
    np.testing.assert_allclose(np.asarray(mm),
                               [y_ref.min(), y_ref.max()], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mom),
        [q_ref.sum(axis=(0, 1, 2)), (q_ref * q_ref).sum(axis=(0, 1, 2))],
        rtol=1e-5)


def test_qmatmul_pallas_aligned_shapes():
    from lbt_tpu.ops.pallas import qmatmul_pallas
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (256, 256)).astype(np.float32)
    w = rng.normal(0, 1, (256, 256)).astype(np.float32)
    y = qmatmul_pallas(x, w, jnp.int32(3), jnp.int32(3),
                       bits_x=8, bits_w=8)
    xc, mx = quantize_int(x, 8, jnp.int32(3))
    wc, mw = quantize_int(w, 8, jnp.int32(3))
    want = (xc.astype(np.float32) @ wc.astype(np.float32)) / (
        float(mx) * float(mw))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_conv1x1_fused_matches_reference():
    """conv1x1_fused_int8 (round-4 matmul-shaped stage-1 kernel) vs the
    XLA unit: codes, BN moments and controller min/max must agree
    exactly on the deterministic path (incl. a padded tail M-tile)."""
    from jax import lax

    from lbt_tpu.ops.pallas.conv1x1_kernels import conv1x1_fused_int8

    inv, mult = 1.0 / 1024.0, 64.0
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-8, 8, (4, 9, 9, 64)).astype(np.int8))
    wq = jnp.asarray(rng.integers(-2, 3, (64, 256)).astype(np.int8))

    y = lax.conv_general_dilated(
        xq, wq.reshape(1, 1, 64, 256), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32) * inv
    q_ref = jnp.round(jnp.clip(y * mult, -128.0, 127.0))
    mom_ref = jnp.stack([q_ref.sum(axis=(0, 1, 2)),
                         (q_ref * q_ref).sum(axis=(0, 1, 2))])
    mm_ref = jnp.stack([y.min(), y.max()])

    yq, mom, mm = conv1x1_fused_int8(
        xq, wq, jnp.float32(inv), jnp.float32(mult), jnp.int32(3),
        stochastic=False, tile_m=128)  # 324 rows -> ragged last tile
    np.testing.assert_array_equal(np.asarray(yq),
                                  np.asarray(q_ref).astype(np.int8))
    np.testing.assert_allclose(np.asarray(mom), np.asarray(mom_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(mm_ref),
                               rtol=1e-6)


def test_conv1x1_fused_saturation_rails():
    """Deterministic saturation semantics: codes must clip to -128 at
    the negative rail (round-of-clip, matching quantize_int and the 3x3
    kernel — not clip-of-round at -127)."""
    from jax import lax

    from lbt_tpu.ops.pallas.conv1x1_kernels import conv1x1_fused_int8

    # Large multiplier so the conv output drives codes past both rails.
    inv, mult = 1.0, 8.0
    rng = np.random.default_rng(1)
    xq = jnp.asarray(rng.integers(-30, 30, (2, 4, 4, 128)).astype(np.int8))
    wq = jnp.asarray(rng.integers(-3, 4, (128, 128)).astype(np.int8))

    y = lax.conv_general_dilated(
        xq, wq.reshape(1, 1, 128, 128), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32) * inv
    q_ref = np.asarray(jnp.round(jnp.clip(y * mult, -128.0, 127.0)))
    assert (q_ref == -128).any() and (q_ref == 127).any(), \
        "test inputs must actually saturate both rails"

    yq, _, _ = conv1x1_fused_int8(
        xq, wq, jnp.float32(inv), jnp.float32(mult), jnp.int32(3),
        stochastic=False)
    np.testing.assert_array_equal(np.asarray(yq), q_ref.astype(np.int8))


@pytest.mark.skipif(
    _interpret,
    reason="interpret mode stubs pltpu.prng_random_bits to zeros")
def test_conv1x1_fused_stochastic_unbiased():
    """Stochastic path: mean of repeated quantizations must approach
    y*mult (floor(x+u), u~U[0,1) is unbiased — catches the signed-shift
    noise bug where u landed in [-0.5, 0.5))."""
    from jax import lax

    from lbt_tpu.ops.pallas.conv1x1_kernels import conv1x1_fused_int8

    inv, mult = 1.0 / 64.0, 4.0
    rng = np.random.default_rng(2)
    xq = jnp.asarray(rng.integers(-8, 8, (1, 4, 4, 128)).astype(np.int8))
    wq = jnp.asarray(rng.integers(-2, 3, (128, 128)).astype(np.int8))

    y = lax.conv_general_dilated(
        xq, wq.reshape(1, 1, 128, 128), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32) * inv
    scaled = np.asarray(y * mult)

    n = 64
    acc = np.zeros_like(scaled, dtype=np.float64)
    for s in range(n):
        yq, _, _ = conv1x1_fused_int8(
            xq, wq, jnp.float32(inv), jnp.float32(mult), jnp.int32(s),
            stochastic=True)
        acc += np.asarray(yq, np.float64)
    mean = acc / n
    # E[floor(x+u)] = x exactly for u~U[0,1) (unbiased); per-element
    # variance of floor(x+u)-x is f(1-f) <= 1/4, so the mean's std is
    # <= sqrt(0.25/n) ~ 0.0625 codes. A [-0.5,0.5) noise bug (signed
    # shift) shifts every element by -0.5 codes, far outside both rails.
    np.testing.assert_allclose(mean, scaled, atol=0.4)
    assert abs(float((mean - scaled).mean())) < 0.1
