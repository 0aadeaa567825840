"""Integer-compute qmatmul/qconv2d vs the float fake-quant formulation:
forward and backward must agree (bit-exact for <=9-bit operand codes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from lbt_tpu.dfxp import grad_quant_barrier, make_sink
from lbt_tpu.ops import qconv2d, qmatmul
from lbt_tpu.ops.qops import conv_pads

E = jnp.int32


def _loss_through_barrier(y, sink, bits_g=8, exp_g=2):
    # put the cotangent on the DFXP grid, as layers do
    yb = grad_quant_barrier(y, bits_g, E(exp_g), sink)
    return jnp.sum(jnp.sin(yb * 0.7) * 11.0)


@pytest.mark.parametrize("bits_x,bits_w", [(8, 8), (9, 8), (4, 4)])
def test_qmatmul_fwd_bwd_matches_sim(bits_x, bits_w):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1.5, (16, 24)).astype(np.float32)
    w = rng.normal(0, 0.5, (24, 12)).astype(np.float32)

    def run(engine):
        def f(x, w, sink):
            y = qmatmul(
                x, w, E(2), E(1), E(2),
                bits_x=bits_x, bits_w=bits_w, bits_g=8, engine=engine,
            )
            return _loss_through_barrier(y, sink)

        loss, grads = jax.value_and_grad(f, argnums=(0, 1))(x, w, make_sink())
        return loss, grads

    l_sim, (dx_s, dw_s) = run("sim")
    l_int, (dx_i, dw_i) = run("int8")
    np.testing.assert_array_equal(np.asarray(l_sim), np.asarray(l_int))
    np.testing.assert_array_equal(np.asarray(dx_s), np.asarray(dx_i))
    np.testing.assert_array_equal(np.asarray(dw_s), np.asarray(dw_i))


@pytest.mark.parametrize("padding,stride,bits_x", [
    ("SAME", 1, 9), ("SAME", 2, 9), ("VALID", 1, 9), ("VALID", 2, 9),
    # bits_x=8 = the lean conv_act_extra=0 scheme: int8 x int8 MXU conv
    ("SAME", 1, 8), ("SAME", 2, 8),
])
def test_qconv_fwd_bwd_matches_sim(padding, stride, bits_x):
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1.2, (4, 11, 11, 5)).astype(np.float32)
    w = rng.normal(0, 0.4, (3, 3, 5, 7)).astype(np.float32)

    def run(engine):
        def f(x, w, sink):
            y = qconv2d(
                x, w, E(2), E(1), E(2),
                strides=(stride, stride), padding=padding,
                bits_x=bits_x, bits_w=8, bits_g=8, engine=engine,
            )
            return _loss_through_barrier(y, sink)

        loss, grads = jax.value_and_grad(f, argnums=(0, 1))(x, w, make_sink())
        return loss, grads

    l_sim, (dx_s, dw_s) = run("sim")
    l_int, (dx_i, dw_i) = run("int8")
    np.testing.assert_array_equal(np.asarray(l_sim), np.asarray(l_int))
    np.testing.assert_array_equal(np.asarray(dx_s), np.asarray(dx_i))
    np.testing.assert_array_equal(np.asarray(dw_s), np.asarray(dw_i))


@pytest.mark.parametrize("padding,stride", [
    ("SAME", 1), ("SAME", 2), ("VALID", 1),
])
def test_qconv_split9_matches_sim(padding, stride):
    """conv9_split (two exact int8 convs of 2h+l split codes,
    ops/qops.py _conv_fwd_9split) must stay bit-identical to the sim
    engine — forward and both backward contractions — including inputs
    that drive codes to the +/-256 rails."""
    rng = np.random.default_rng(7)
    x = rng.normal(0, 3.0, (4, 11, 11, 5)).astype(np.float32)
    w = rng.normal(0, 0.4, (3, 3, 5, 7)).astype(np.float32)

    def run(engine, split9):
        def f(x, w, sink):
            y = qconv2d(
                x, w, E(2), E(1), E(2),
                strides=(stride, stride), padding=padding,
                bits_x=9, bits_w=8, bits_g=8, engine=engine,
                split9=split9,
            )
            return _loss_through_barrier(y, sink)

        loss, grads = jax.value_and_grad(f, argnums=(0, 1))(x, w, make_sink())
        return loss, grads

    l_sim, (dx_s, dw_s) = run("sim", False)
    l_spl, (dx_p, dw_p) = run("int8", True)
    np.testing.assert_array_equal(np.asarray(l_sim), np.asarray(l_spl))
    np.testing.assert_array_equal(np.asarray(dx_s), np.asarray(dx_p))
    np.testing.assert_array_equal(np.asarray(dw_s), np.asarray(dw_p))


def test_qconv_transpose_math_vs_autodiff():
    """The hand-built dilated-conv backward must equal autodiff of the
    plain float conv for arbitrary stride/padding combinations."""
    rng = np.random.default_rng(2)
    for (h, w_, kh, kw, s, pad) in [
        (8, 8, 3, 3, 1, "SAME"), (9, 7, 3, 3, 2, "SAME"),
        (8, 8, 5, 5, 2, "VALID"), (11, 11, 1, 1, 2, "SAME"),
        (28, 28, 5, 5, 1, "VALID"),
    ]:
        x = rng.normal(0, 1, (2, h, w_, 3)).astype(np.float32)
        wt = rng.normal(0, 1, (kh, kw, 3, 4)).astype(np.float32)
        pads = conv_pads(pad, (h, w_), (kh, kw), (s, s))

        def conv(x, wt):
            return lax.conv_general_dilated(
                x, wt, (s, s), pads,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        y, vjp = jax.vjp(conv, x, wt)
        g = rng.normal(0, 1, y.shape).astype(np.float32)
        dx_ref, dw_ref = vjp(g)

        # integer path with 32-wide "grids" disabled -> exercise the
        # transposed-conv construction directly via qconv2d int engine
        def f(x, wt):
            return jnp.vdot(
                qconv2d(x, wt, E(2), E(2), E(2),
                        strides=(s, s), padding=pad,
                        bits_x=9, bits_w=8, bits_g=32, engine="int8"),
                g)

        dx, dw = jax.grad(f, argnums=(0, 1))(x, wt)
        # compare against autodiff of conv evaluated at the quantized
        # operands: recompute with fake-quant sim for identical operands
        def f_sim(x, wt):
            return jnp.vdot(
                qconv2d(x, wt, E(2), E(2), E(2),
                        strides=(s, s), padding=pad,
                        bits_x=9, bits_w=8, bits_g=32, engine="sim"),
                g)

        dx_s, dw_s = jax.grad(f_sim, argnums=(0, 1))(x, wt)
        np.testing.assert_allclose(
            np.asarray(dx), np.asarray(dx_s), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(dw), np.asarray(dw_s), rtol=1e-5, atol=1e-4)


def test_barrier_quantizes_cotangent_and_reports_stats():
    x = jnp.array([1.0, 2.0, 3.0])

    def f(x, sink):
        y = grad_quant_barrier(x, 8, E(0), sink)
        # cotangent of y is (2.3, 2.3, 2.3); at exp=0, mult=128 -> on-grid
        return jnp.sum(y) * 2.3

    (dx, dsink) = jax.grad(f, argnums=(0, 1))(x, make_sink())
    # 2.3 * 128 = 294.4 -> clips to 127/128 grid? no: 294.4 > 127 -> clip
    np.testing.assert_allclose(np.asarray(dx), 127.0 / 128.0)
    # overflow rate of the float cotangent at exp=0: all elements overflow
    np.testing.assert_allclose(np.asarray(dsink), [1.0, 1.0])


def test_barrier_passthrough_bits32():
    x = jnp.ones(4)

    def f(x, sink):
        return jnp.sum(grad_quant_barrier(x, 32, E(0), sink)) * 5.0

    dx = jax.grad(f)(x, make_sink())
    np.testing.assert_allclose(np.asarray(dx), 5.0)
