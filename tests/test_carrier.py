"""Tests for the bf16 activation carrier (QuantConfig.act_dtype).

The carrier stores inter-layer activations/cotangents in bfloat16 while
every quantized layer upcasts to f32 internally.  Key invariant: DFXP
values on <=9-bit grids are EXACT in bfloat16 (codes of magnitude <= 256
scaled by a power of two), so the carrier only rounds the
not-yet-requantized boundary tensors.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.dfxp.quantize import quantize
from lbt_tpu.models import build_model
from lbt_tpu.nn.core import Ctx
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_train_step


def test_grid_values_exact_in_bf16():
    # every code of an 8-bit (and 9-bit) grid survives an f32->bf16->f32
    # round trip exactly, at several exponents
    for bits in (4, 8, 9):
        for exp in (-3, 0, 2, 7):
            mult = 2.0 ** (bits - 1 - exp)
            codes = np.arange(-(2 ** (bits - 1)), 2 ** (bits - 1))
            vals = (codes / mult).astype(np.float32)
            rt = np.asarray(
                jnp.asarray(vals).astype(jnp.bfloat16).astype(jnp.float32))
            np.testing.assert_array_equal(rt, vals)


def test_quantize_output_survives_bf16():
    key = jax.random.key(0)
    x = jax.random.normal(key, (64, 33)) * 3.0
    q = quantize(x, 8, jnp.int32(2))
    rt = q.astype(jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(q))


@pytest.mark.parametrize("fused_bn", [False, True])
@pytest.mark.slow
def test_bf16_carrier_trains(fused_bn):
    cfg = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        act_dtype="bf16", fused_bn=fused_bn, bn_momentum=0.9)
    model = build_model("CIFAR10_Resnet20", cfg)
    tc = TrainConfig(batch_size=16)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    step = make_train_step(model, tc)
    x = jax.random.normal(jax.random.key(1), (16, 32, 32, 3), jnp.float32)
    y = jax.random.randint(jax.random.key(2), (16,), 0, 10)
    losses = []
    for i in range(12):
        params, qstate, vel, m = step(
            params, qstate, vel, x, y, jnp.int32(i), jnp.float32(0.05),
            jax.random.key(3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses  # memorizes the fixed batch


@pytest.mark.slow
def test_bf16_carrier_intermediate_dtype():
    # the activation that crosses a layer boundary really is bfloat16
    cfg = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        act_dtype="bf16")
    model = build_model("MNIST", cfg)
    params, qstate = model.init(jax.random.key(0))
    sinks = model.make_sinks()
    x = jax.random.normal(jax.random.key(1), (4, 28, 28, 1), jnp.float32)

    first = model.net.layers[0]
    y, _ = first.apply(
        params[first.name], qstate[first.name],
        sinks.get(first.name, {}), x,
        Ctx(train=True, key=jax.random.key(2)))
    assert y.dtype == jnp.bfloat16

    # full forward still yields f32 loss/accuracy
    logits, _ = model.apply(params, qstate, sinks, x,
                            Ctx(train=False, key=None))
    loss, acc = model.loss_and_acc(
        logits, jnp.zeros((4,), jnp.int32))
    assert loss.dtype == jnp.float32


def test_remat_bn_unfused_equivalent():
    # jax.checkpoint around the norm+rescale BN preserves semantics.
    # NOT asserted bitwise: the remat annotation changes XLA's fusion
    # context, which can flip value-changing algebraic rewrites
    # (a/sqrt(b) <-> a*rsqrt(b), ~1e-6 relative), and a 1-ulp input
    # wobble near a stochastic-rounding threshold flips that element's
    # quantized cotangent by one grid step.  Assert the loss matches
    # tightly and gradients agree on almost all elements.
    from lbt_tpu.nn import core
    from lbt_tpu.nn.norm import BatchNorm
    from lbt_tpu.nn.core import finalize

    outs = {}
    for remat in (False, True):
        cfg = dataclasses.replace(
            QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
            remat_bn=remat)
        layer = finalize(BatchNorm("bn", cfg, 16))
        params, qstate = layer.init(jax.random.key(0))
        sinks = core.make_sinks(layer)
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, 16))

        def f(params, sinks, x):
            y, _ = layer.apply(params, qstate, sinks, x,
                               Ctx(train=True, key=jax.random.key(3)))
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))

        loss, grads = jax.jit(
            jax.value_and_grad(f, argnums=(0, 1, 2)))(params, sinks, x)
        outs[remat] = (loss, grads)
    l0, g0 = outs[False]
    l1, g1 = outs[True]
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.mean(np.abs(a)) + 1e-12
        assert np.mean(np.abs(a - b)) / denom < 0.05, (a.shape, denom)


@pytest.mark.slow
def test_remat_bn_trains():
    cfg = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        act_dtype="bf16", fused_bn=True, remat_bn=True, bn_momentum=0.9)
    model = build_model("CIFAR10_Resnet20", cfg)
    tc = TrainConfig(batch_size=16)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    step = make_train_step(model, tc)
    x = jax.random.normal(jax.random.key(1), (16, 32, 32, 3), jnp.float32)
    y = jax.random.randint(jax.random.key(2), (16,), 0, 10)
    losses = []
    for i in range(12):
        params, qstate, vel, m = step(
            params, qstate, vel, x, y, jnp.int32(i), jnp.float32(0.05),
            jax.random.key(3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("fused_bn", [False, True])
def test_bn_residual_q16_equivalent(fused_bn):
    # The save_only_these_names policy (bn_residual_q16) must not change
    # semantics: the saved bf16 copy of the quantized input is exact
    # (<=9-bit grid) and the backward replay is the same elementwise
    # math.  Same caveat as remat_bn on bitwise equality (remat
    # annotations can shift XLA algebraic-rewrite contexts), so assert
    # tight loss agreement and near-universal gradient agreement.
    from lbt_tpu.nn import core
    from lbt_tpu.nn.core import Ctx, finalize
    from lbt_tpu.nn.norm import BatchNorm

    outs = {}
    for q16 in (False, True):
        cfg = dataclasses.replace(
            QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
            fused_bn=fused_bn, bn_residual_q16=q16)
        layer = finalize(BatchNorm("bn", cfg, 16))
        params, qstate = layer.init(jax.random.key(0))
        sinks = core.make_sinks(layer)
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, 16))

        def f(params, sinks, x):
            y, _ = layer.apply(params, qstate, sinks, x,
                               Ctx(train=True, key=jax.random.key(3)))
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))

        loss, grads = jax.jit(
            jax.value_and_grad(f, argnums=(0, 1, 2)))(params, sinks, x)
        outs[q16] = (loss, grads)
    l0, g0 = outs[False]
    l1, g1 = outs[True]
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.mean(np.abs(a)) + 1e-12
        assert np.mean(np.abs(a - b)) / denom < 0.05, (a.shape, denom)


@pytest.mark.slow
def test_bn_residual_q16_trains():
    cfg = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        act_dtype="bf16", fused_bn=True, bn_residual_q16=True,
        bn_momentum=0.9)
    model = build_model("CIFAR10_Resnet20", cfg)
    tc = TrainConfig(batch_size=16)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    step = make_train_step(model, tc)
    x = jax.random.normal(jax.random.key(1), (16, 32, 32, 3), jnp.float32)
    y = jax.random.randint(jax.random.key(2), (16,), 0, 10)
    losses = []
    for i in range(12):
        params, qstate, vel, m = step(
            params, qstate, vel, x, y, jnp.int32(i), jnp.float32(0.05),
            jax.random.key(3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_bf16_carrier_eval_matches_itself():
    # eval is deterministic (round-to-nearest) under the carrier
    cfg = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        act_dtype="bf16")
    model = build_model("CIFAR10", cfg)
    params, qstate = model.init(jax.random.key(0))
    sinks = model.make_sinks()
    x = jax.random.normal(jax.random.key(1), (8, 32, 32, 3), jnp.float32)
    ctx = Ctx(train=False, key=None)
    l1, _ = model.apply(params, qstate, sinks, x, ctx)
    l2, _ = model.apply(params, qstate, sinks, x, ctx)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
