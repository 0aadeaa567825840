"""Inference / deployment path (lbt_tpu/infer.py)."""

import jax
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
