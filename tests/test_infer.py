"""Inference / deployment path (lbt_tpu/infer.py)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.infer import (
    Predictor,
    export_quantized_weights,
    exported_nbytes,
    make_predict_fn,
    restore_quantized_weights,
)
from lbt_tpu.models import build_model


def test_predict_fn_deterministic_even_with_stochastic_cfg():
    cfg = QuantConfig.uniform(8)  # stochastic=True
    model = build_model("PI_MNIST", cfg)
    params, qstate = model.init(jax.random.key(0))
    predict = make_predict_fn(model)
    x = np.random.default_rng(0).normal(size=(8, 784)).astype(np.float32)
    l1 = np.asarray(predict(params, qstate, x))
    l2 = np.asarray(predict(params, qstate, x))
    np.testing.assert_array_equal(l1, l2)
    assert l1.shape == (8,)


def test_export_restore_roundtrip_and_size():
    cfg = QuantConfig.uniform(8, stochastic=False)
    model = build_model("MNIST", cfg)
    params, qstate = model.init(jax.random.key(0))
    exported = export_quantized_weights(model, params, qstate)
    qb, fb = exported_nbytes(exported)
    assert qb < 0.3 * fb  # int8 weights: ~4x smaller

    restored = restore_quantized_weights(exported)
    # restored weights lie exactly on the DFXP grid the forward pass uses
    from lbt_tpu.dfxp.quantize import quantize
    w = np.asarray(params["conv1"]["W"])
    wq = quantize(w, 8, qstate["conv1"]["exp"]["w"])
    np.testing.assert_array_equal(
        np.asarray(restored["conv1"]["W"]), np.asarray(wq))

    # predictions from restored params equal predictions from originals
    # (the forward pass quantizes to the same grid either way)
    predict = make_predict_fn(model)
    x = np.random.default_rng(1).normal(
        size=(4, 28, 28, 1)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(predict(params, qstate, x)),
        np.asarray(predict(restored, qstate, x)))


@pytest.mark.slow
def test_predictor_from_checkpoint(tmp_path):
    from lbt_tpu.data.datasets import load_dataset
    from lbt_tpu.train.trainer import Trainer

    cfg = QuantConfig.uniform(8)
    model = build_model("PI_MNIST", cfg)
    tc = TrainConfig(batch_size=32, n_epoch=1,
                     checkpoint_dir=str(tmp_path / "ckpt"))
    data = load_dataset("pi_mnist", n_train=128, n_test=64)
    tr = Trainer(model, tc, data)
    tr.train_epoch(0)
    tr.save()

    p = Predictor.from_checkpoint(model, str(tmp_path / "ckpt"))
    x, _ = data["test"]
    labels = np.asarray(p(x[:16]))
    assert labels.shape == (16,)
    assert set(labels.tolist()) <= set(range(10))


def test_int4_packed_export_roundtrip():
    from lbt_tpu.infer import (export_quantized_weights, exported_nbytes,
                               restore_quantized_weights)
    cfg = QuantConfig(bits_w=4, bits_a=8, bits_b=8, bits_g=8)
    model = build_model("PI_MNIST", cfg)
    params, qstate = model.init(jax.random.key(0))
    exported = export_quantized_weights(model, params, qstate)
    restored = restore_quantized_weights(exported)
    # restored W lies exactly on the 4-bit grid the forward pass uses
    from lbt_tpu.dfxp.quantize import quantize
    for name in ("dense1", "dense2"):
        w = params[name]["W"]
        e = qstate[name]["exp"]["w"]
        want = np.asarray(quantize(w, 4, e))
        np.testing.assert_array_equal(np.asarray(restored[name]["W"]), want)
    qb, fb = exported_nbytes(exported)
    assert qb < fb / 6  # ~8x on W (4-bit packed), b stays int8


# ---------------------------------------------------------------------------
# BatchNorm folding (serving-time transform)
# ---------------------------------------------------------------------------


def _randomize_bn(params, qstate, seed=0):
    """Give BN running stats / affine non-trivial values so a fold has
    something to absorb."""
    rng = np.random.default_rng(seed)

    def walk_q(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk_q(v)
            elif k == "mean":
                out[k] = jnp.asarray(
                    rng.normal(0, 0.5, v.shape), jnp.float32)
            elif k == "var":
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 2.0, v.shape), jnp.float32)
            else:
                out[k] = v
        return out

    def walk_p(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk_p(v)
            elif k == "gamma":
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape), jnp.float32)
            elif k == "beta":
                out[k] = jnp.asarray(
                    rng.normal(0, 0.3, v.shape), jnp.float32)
            else:
                out[k] = v
        return out

    return walk_p(params), walk_q(qstate)


def _eval_logits(model, params, qstate, x):
    from lbt_tpu.nn.core import Ctx
    sinks = model.make_sinks()
    y, _ = model.apply(params, qstate, sinks, x,
                       Ctx(train=False, key=None, update=False))
    return np.asarray(y)


def test_fold_batchnorm_fp32_exact():
    """Unquantized: folding is pure algebra — logits must match."""
    from lbt_tpu.infer import fold_batchnorm
    from lbt_tpu.nn.norm import BatchNorm

    model = build_model("CIFAR10_Resnet20", QuantConfig.fp32())
    params, qstate = model.init(jax.random.key(0))
    params, qstate = _randomize_bn(params, qstate)
    x = np.random.default_rng(1).normal(
        0, 1, (8, 32, 32, 3)).astype(np.float32)

    l0 = _eval_logits(model, params, qstate, x)
    fm, fp, fq = fold_batchnorm(model, params, qstate)
    l1 = _eval_logits(fm, fp, fq, x)
    np.testing.assert_allclose(l0, l1, rtol=1e-3, atol=1e-4)

    def count_bn(layer):
        return (isinstance(layer, BatchNorm)
                + sum(count_bn(c) for c in layer.children()))
    assert count_bn(model.net) == 21 and count_bn(fm.net) == 0


@pytest.mark.slow
def test_fold_batchnorm_int8_agreement():
    """Quantized: the fold removes the BN input-quantization site, so
    logits shift by quantization noise only — predictions must agree."""
    from lbt_tpu.infer import fold_batchnorm

    cfg = QuantConfig.uniform(8, stochastic=False)
    model = build_model("CIFAR10_Resnet20", cfg)
    params, qstate = model.init(jax.random.key(0))
    params, qstate = _randomize_bn(params, qstate)
    x = np.random.default_rng(2).normal(
        0, 1, (16, 32, 32, 3)).astype(np.float32)

    l0 = _eval_logits(model, params, qstate, x)
    fm, fp, fq = fold_batchnorm(model, params, qstate)
    l1 = _eval_logits(fm, fp, fq, x)
    agree = float((l0.argmax(-1) == l1.argmax(-1)).mean())
    corr = float(np.corrcoef(l0.ravel(), l1.ravel())[0, 1])
    assert agree >= 0.9, agree
    assert corr >= 0.97, corr


def test_fold_batchnorm_fused_and_bias_paths():
    """fused_bn models fold too, and a biased conv before BN folds its
    bias through the affine (b' = (b - mean)*scale + beta)."""
    from lbt_tpu.infer import fold_batchnorm
    from lbt_tpu.nn.core import Sequential
    from lbt_tpu.nn.layers import Conv2d, Flatten
    from lbt_tpu.nn.norm import BatchNorm
    from lbt_tpu.nn.layers import Dense
    from lbt_tpu.nn.model import Model

    cfg = dataclasses_replace_fp32_fused()
    layers = [
        Conv2d("c1", cfg, (3, 3, 3, 8), (1, 1), "SAME", use_bias=True),
        BatchNorm("c1-bn", cfg, 8),
        Flatten("flat"),
        Dense("fc", cfg, 8 * 8 * 8, 10),
    ]
    model = Model("tiny", layers, (8, 8, 3), 10, cfg)
    params, qstate = model.init(jax.random.key(3))
    params, qstate = _randomize_bn(params, qstate, seed=4)
    # non-zero conv bias so the bias-fold path is exercised
    params["c1"]["b"] = jnp.asarray(
        np.random.default_rng(5).normal(0, 0.2, (8,)), jnp.float32)

    x = np.random.default_rng(6).normal(
        0, 1, (4, 8, 8, 3)).astype(np.float32)
    l0 = _eval_logits(model, params, qstate, x)
    fm, fp, fq = fold_batchnorm(model, params, qstate)
    l1 = _eval_logits(fm, fp, fq, x)
    np.testing.assert_allclose(l0, l1, rtol=1e-3, atol=1e-4)


def dataclasses_replace_fp32_fused():
    import dataclasses
    return dataclasses.replace(QuantConfig.fp32(), fused_bn=True)
