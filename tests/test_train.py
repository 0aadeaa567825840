"""End-to-end training: jitted step semantics, engine equivalence,
convergence on a learnable task, checkpoints (SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.data.datasets import load_dataset, make_augment
from lbt_tpu.models import build_model
from lbt_tpu.train.optim import momentum_init, momentum_update, piecewise_lr
from lbt_tpu.train.step import make_eval_step, make_train_step
from lbt_tpu.train.trainer import Trainer


def _data(n=256, d=20, classes=4, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 1, (d, classes)).astype(np.float32)
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    y = np.argmax(x @ w, axis=1).astype(np.int32)
    return x, y


def test_momentum_matches_tf_semantics():
    # v <- m v + g ; w <- w - lr v
    params = {"w": jnp.array([1.0, 2.0])}
    vel = momentum_init(params)
    g = {"w": jnp.array([0.5, -0.5])}
    p1, v1 = momentum_update(params, vel, g, 0.1, 0.9)
    np.testing.assert_allclose(np.asarray(v1["w"]), [0.5, -0.5])
    np.testing.assert_allclose(np.asarray(p1["w"]), [0.95, 2.05])
    p2, v2 = momentum_update(p1, v1, g, 0.1, 0.9)
    np.testing.assert_allclose(np.asarray(v2["w"]), [0.95, -0.95])
    np.testing.assert_allclose(np.asarray(p2["w"]), [0.855, 2.145],
                               rtol=1e-6)


def test_piecewise_lr_schedule():
    # reference hard-coded decays at 80/120/140 (trainer.py:117-132)
    assert piecewise_lr(0.01, 0.1, (80, 120, 140), 0) == 0.01
    assert piecewise_lr(0.01, 0.1, (80, 120, 140), 80) == pytest.approx(1e-3)
    assert piecewise_lr(0.01, 0.1, (80, 120, 140), 125) == pytest.approx(1e-4)
    assert piecewise_lr(0.01, 0.1, (80, 120, 140), 159) == pytest.approx(1e-5)


@pytest.mark.parametrize("engine,noise_mode", [
    ("sim", "prng"), ("int8", "prng"), ("int8", "hash")])
def test_loss_decreases_dense_net(engine, noise_mode):
    cfg = QuantConfig.uniform(8, engine=engine, noise_mode=noise_mode)
    from lbt_tpu.nn import Dense, ReLU
    from lbt_tpu.nn.model import Model
    model = Model("toy", [
        Dense("d1", cfg, 20, 64),
        ReLU(),
        Dense("d2", cfg, 64, 4),
    ], input_shape=(20,), num_classes=4, cfg=cfg)

    tc = TrainConfig(lr=0.05, batch_size=64)
    step_fn = make_train_step(model, tc)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    x, y = _data()
    losses = []
    for i in range(60):
        sel = slice((i * 64) % 256, (i * 64) % 256 + 64)
        params, qstate, vel, m = step_fn(
            params, qstate, vel, x[sel], y[sel], i, jnp.float32(0.05),
            jax.random.key(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert float(m["accuracy"]) > 0.55


def test_grad_exponents_adapt_during_training():
    cfg = QuantConfig.uniform(8)
    from lbt_tpu.nn import Dense
    from lbt_tpu.nn.model import Model
    model = Model("toy", [Dense("d1", cfg, 20, 4)],
                  input_shape=(20,), num_classes=4, cfg=cfg)
    tc = TrainConfig(lr=0.01, batch_size=64)
    step_fn = make_train_step(model, tc)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    x, y = _data()
    e0 = int(qstate["d1"]["exp"]["grad"])
    for i in range(10):
        params, qstate, vel, m = step_fn(
            params, qstate, vel, x[:64], y[:64], i, jnp.float32(0.01),
            jax.random.key(1))
    e1 = int(qstate["d1"]["exp"]["grad"])
    # softmax-CE cotangents are O(1/batch) -> controller must tighten
    assert e1 < e0, (e0, e1)


def test_range_update_cadence_gates_controllers():
    """range_update_every=K: exponents move ONLY on steps where
    step % K == 0, and the K=1 path is unchanged (controllers every
    step, the reference cadence)."""
    import dataclasses

    from lbt_tpu.nn import Dense
    from lbt_tpu.nn.model import Model

    def run(cadence, n_steps=6, warmup=0):
        cfg = dataclasses.replace(QuantConfig.uniform(8),
                                  range_update_every=cadence,
                                  range_update_warmup_steps=warmup)
        model = Model("toy", [Dense("d1", cfg, 20, 4)],
                      input_shape=(20,), num_classes=4, cfg=cfg)
        tc = TrainConfig(lr=0.01, batch_size=64)
        step_fn = make_train_step(model, tc)
        params, qstate = model.init(jax.random.key(0))
        vel = momentum_init(params)
        x, y = _data()
        # large inputs so the x controller must widen every chance it gets
        xs = x[:64] * 100.0
        traj = [int(qstate["d1"]["exp"]["x"])]
        gtraj = [int(qstate["d1"]["exp"]["grad"])]
        for i in range(n_steps):
            params, qstate, vel, _ = step_fn(
                params, qstate, vel, xs, y[:64], i, jnp.float32(0.0),
                jax.random.key(1))
            traj.append(int(qstate["d1"]["exp"]["x"]))
            gtraj.append(int(qstate["d1"]["exp"]["grad"]))
        return traj, gtraj

    t1, g1 = run(1)
    t3, g3 = run(3)
    # ungated: widens by 1 every step up to the clamp (bits-1 = 7)
    assert t1[:6] == [2, 3, 4, 5, 6, 7]
    # gated at K=3: moves only on steps 0 and 3
    assert t3 == [2, 3, 3, 3, 4, 4, 4]
    # backward sites gate too: grad exponent holds on off steps
    for i in range(1, len(g3)):
        if (i - 1) % 3 != 0:
            assert g3[i] == g3[i - 1], (i, g3)
    # and moves at least once on a gated-on step (tiny CE cotangents
    # tighten), matching the ungated direction
    assert g3[-1] < g3[0] and g1[-1] < g1[0]
    # warmup window: controllers run every step while step < warmup
    t3w, _ = run(3, warmup=4)
    assert t3w == [2, 3, 4, 5, 6, 6, 6]  # steps 0-3 warm, 4-5 gated off


@pytest.mark.slow
def test_lenet_short_training_loss_decreases():
    """BASELINE config 1: tiny CPU-runnable LeNet/MNIST DFP-INT8 slice."""
    cfg = QuantConfig.uniform(8, engine="int8")
    model = build_model("MNIST", cfg)
    tc = TrainConfig(lr=0.02, batch_size=32, n_epoch=1, log_every=1000)
    data = load_dataset("mnist", n_train=512, n_test=256)
    trainer = Trainer(model, tc, data)
    l0 = trainer.evaluate()["loss"]
    trainer.train_epoch(0)
    ev = trainer.evaluate()
    assert ev["loss"] < l0, (l0, ev)


def test_eval_step_deterministic_without_stochastic():
    cfg = QuantConfig.uniform(8, stochastic=False)
    model = build_model("PI_MNIST", cfg)
    params, qstate = model.init(jax.random.key(0))
    ev = make_eval_step(model)
    x = np.random.default_rng(0).normal(size=(8, 784)).astype(np.float32)
    y = np.zeros(8, np.int32)
    m1 = ev(params, qstate, x, y, jax.random.key(1))
    m2 = ev(params, qstate, x, y, jax.random.key(2))
    assert float(m1["loss"]) == float(m2["loss"])


def test_checkpoint_roundtrip(tmp_path):
    cfg = QuantConfig.uniform(8)
    model = build_model("PI_MNIST", cfg)
    tc = TrainConfig(batch_size=32, n_epoch=1,
                     checkpoint_dir=str(tmp_path / "ckpt"))
    data = load_dataset("pi_mnist", n_train=128, n_test=64)
    tr = Trainer(model, tc, data)
    tr.train_epoch(0)
    tr.epoch = 1
    tr.save()

    tr2 = Trainer(model, tc, data)
    assert tr2.maybe_restore()
    assert tr2.epoch == 1
    assert tr2.step == tr.step
    a = jax.tree.leaves(tr.params)
    b = jax.tree.leaves(tr2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(tr.qstate),
                    jax.tree.leaves(tr2.qstate)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_augmentation_shapes_and_content():
    aug = make_augment("cifar10")
    x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(
        np.float32)
    y = jax.jit(aug)(jax.random.key(0), x)
    assert y.shape == x.shape
    # padding introduces zeros at some crops; values subset of padded orig
    assert np.isfinite(np.asarray(y)).all()


def test_synthetic_dataset_is_learnable():
    data = load_dataset("mnist", n_train=512, n_test=128)
    assert data["synthetic"] in (True, False)
    xtr, ytr = data["train"]
    assert xtr.shape == (512, 28, 28, 1)
    assert set(np.unique(ytr)) <= set(range(10))


def test_scan_step_matches_sequential():
    """K scanned steps per dispatch == K sequential dispatches, bitwise
    (deterministic rounding)."""
    from lbt_tpu.nn import Dense, ReLU
    from lbt_tpu.nn.model import Model
    from lbt_tpu.train.step import make_scan_train_step

    cfg = QuantConfig.uniform(8, stochastic=False)
    model = Model("toy", [
        Dense("d1", cfg, 12, 32), ReLU(), Dense("d2", cfg, 32, 4),
    ], input_shape=(12,), num_classes=4, cfg=cfg)
    tc = TrainConfig(lr=0.05, batch_size=16)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    rng = np.random.default_rng(0)
    xs = rng.normal(0, 1, (3, 16, 12)).astype(np.float32)
    ys = rng.integers(0, 4, (3, 16)).astype(np.int32)
    key = jax.random.key(5)
    lr = jnp.float32(0.05)
    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731

    seq = make_train_step(model, tc)
    p1, q1, v1 = copy(params), copy(qstate), copy(vel)
    for i in range(3):
        p1, q1, v1, m1 = seq(p1, q1, v1, xs[i], ys[i], i, lr, key)

    scan = make_scan_train_step(model, tc, 3)
    p2, q2, v2, ms = scan(copy(params), copy(qstate), copy(vel),
                          jnp.asarray(xs), jnp.asarray(ys),
                          jnp.int32(0), lr, key)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(q1), jax.tree.leaves(q2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(m1["loss"]), float(ms["loss"][-1]))


def test_sim_bf16_engine_trains():
    cfg = QuantConfig.uniform(8, engine="sim_bf16")
    from lbt_tpu.nn import Dense, ReLU
    from lbt_tpu.nn.model import Model
    model = Model("toy", [
        Dense("d1", cfg, 20, 64), ReLU(), Dense("d2", cfg, 64, 4),
    ], input_shape=(20,), num_classes=4, cfg=cfg)
    tc = TrainConfig(lr=0.05, batch_size=64)
    step_fn = make_train_step(model, tc)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    x, y = _data()
    losses = []
    for i in range(40):
        sel = slice((i * 64) % 256, (i * 64) % 256 + 64)
        params, qstate, vel, m = step_fn(
            params, qstate, vel, x[sel], y[sel], i, jnp.float32(0.05),
            jax.random.key(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.6, losses[::10]


def test_unsafe_rbg_noise_impl():
    """Both PRNG impls flow through quantize/barrier key plumbing."""
    from lbt_tpu.dfxp.quantize import quantize_ste

    x = jnp.full((64, 64), 0.3)
    for impl in ("threefry2x32", "unsafe_rbg"):
        key = jax.random.key(3, impl=impl)
        q = quantize_ste(x, 8, jnp.int32(2), key, stochastic=True)
        vals = np.unique(np.asarray(q))
        assert len(vals) <= 2          # two neighboring grid points
        assert abs(float(q.mean()) - 0.3) < 0.02


@pytest.mark.slow
def test_faithful_mode_flags_end_to_end():
    """All reference-quirk toggles at once: faithful_eval (train-mode BN
    + dropout in eval), shared-axis0 noise, momentum reset at decays."""
    cfg = QuantConfig.uniform(8, faithful_eval=True,
                              noise_shared_axis0=True)
    model = build_model("MNIST", cfg)
    tc = TrainConfig(batch_size=32, n_epoch=2, log_every=1000,
                     lr_decay_epochs=(1,), reset_momentum_on_decay=True)
    data = load_dataset("mnist", n_train=256, n_test=128)
    tr = Trainer(model, tc, data)
    tr.train_epoch(0)
    v_before = jax.tree.leaves(tr.velocity)[0]
    assert float(jnp.max(jnp.abs(v_before))) > 0
    tr.train_epoch(1)  # decay epoch: velocity was reset before stepping
    ev = tr.evaluate()
    assert np.isfinite(ev["loss"])
    # faithful eval uses batch statistics + live dropout: two evals with
    # the same params still agree on loss structure (stochastic noise is
    # keyed identically inside evaluate)
    ev2 = tr.evaluate()
    assert ev["loss"] == ev2["loss"]


def test_warmup_schedule():
    assert piecewise_lr(0.1, 0.1, (80,), 0, warmup_epochs=4) == \
        pytest.approx(0.025)
    assert piecewise_lr(0.1, 0.1, (80,), 3, warmup_epochs=4) == \
        pytest.approx(0.1)
    assert piecewise_lr(0.1, 0.1, (80,), 100, warmup_epochs=4) == \
        pytest.approx(0.01)


@pytest.mark.slow
def test_vgg16_cifar100_int4w_int8a_trains():
    """BASELINE config 3: VGG-16/CIFAR-100 with INT4 weights / INT8
    activations, end-to-end through the Trainer."""
    cfg = QuantConfig(bits_w=4, bits_a=8, bits_b=8, bits_g=8,
                      engine="int8")
    model = build_model("VGG16_CIFAR100", cfg)
    tc = TrainConfig(lr=0.01, batch_size=16, n_epoch=1, log_every=1000)
    data = load_dataset("cifar100", n_train=64, n_test=32)
    trainer = Trainer(model, tc, data)
    l0 = trainer.evaluate()["loss"]
    trainer.train_epoch(0)
    ev = trainer.evaluate()
    assert np.isfinite(ev["loss"])
    assert ev["loss"] < l0, (l0, ev)


@pytest.mark.skipif(not os.environ.get("LBT_SLOW_TESTS"),
                    reason="~8 min on CPU; set LBT_SLOW_TESTS=1 "
                           "(verified in round logs)")
def test_resnet50_imagenet_subset_trains():
    """BASELINE config 4 (tiny slice): ResNet-50 at 224x224, full DFXP
    low-bit loop end-to-end through the Trainer."""
    cfg = QuantConfig.uniform(8, engine="int8")
    model = build_model("Imagenet_Resnet50", cfg)
    tc = TrainConfig(lr=0.01, batch_size=4, n_epoch=1, log_every=1000)
    data = load_dataset("imagenet", n_train=16, n_test=8)
    trainer = Trainer(model, tc, data)
    trainer.train_epoch(0)
    ev = trainer.evaluate()
    assert np.isfinite(ev["loss"])


@pytest.mark.slow
def test_trainer_scan_steps_matches_eager():
    """Trainer with scan_steps=K (augment inside the compiled block)
    produces the same trajectory as per-step dispatch, including the
    remainder batches of an epoch not divisible by K."""
    import dataclasses

    cfg = QuantConfig.uniform(8, stochastic=False)
    tc = TrainConfig(lr=0.02, batch_size=16, n_epoch=1, log_every=1000)
    data = load_dataset("cifar10", n_train=96, n_test=32)
    augment = make_augment("cifar10")

    def run(scan_steps):
        model = build_model("CIFAR10", cfg)
        t = Trainer(model, dataclasses.replace(tc, scan_steps=scan_steps),
                    data, augment=augment)
        t.train_epoch(0)
        return t

    t_eager = run(0)
    t_scan = run(4)  # 96/16 = 6 steps -> one 4-block + 2 remainder steps
    assert t_eager.step == t_scan.step == 6
    for a, b in zip(jax.tree.leaves(t_eager.params),
                    jax.tree.leaves(t_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(t_eager.qstate),
                    jax.tree.leaves(t_scan.qstate)):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.integer):  # controller exponents
            np.testing.assert_array_equal(a, b)
        else:  # BN running stats etc.
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_eval_count_weighted_with_ragged_final_batch():
    """Default eval is a count-weighted mean over examples: with
    drop_remainder=False and a short final batch, evaluate() must equal
    a single-batch evaluation of the whole test set.  The reference
    instead averages per-batch means (reference trainer.py:185-186),
    over-weighting the short batch — that behavior stays available
    under ``faithful_eval`` (checked to differ here)."""
    import dataclasses

    cfg = QuantConfig.uniform(32)  # passthrough: per-example determinism
    tc = TrainConfig(batch_size=16, n_epoch=1, log_every=1000,
                     eval_batch_size=32)
    data = load_dataset("mnist", n_train=64, n_test=80)  # 32+32+16
    model = build_model("MNIST", cfg)
    tr = Trainer(model, tc, data)
    tr.train_epoch(0)
    ragged = tr.evaluate()

    tr_full = Trainer(model, dataclasses.replace(tc, eval_batch_size=80),
                      data)
    tr_full.params, tr_full.qstate = tr.params, tr.qstate
    full = tr_full.evaluate()
    assert ragged["loss"] == pytest.approx(full["loss"], rel=1e-5)
    assert ragged["accuracy"] == pytest.approx(full["accuracy"], rel=1e-6)

    # the reference's mean-of-batch-means, reproduced independently
    exp_loss, exp_acc, n = 0.0, 0.0, 0
    key = jax.random.fold_in(tr.base_key, 0xE7A1)
    from lbt_tpu.data.pipeline import batch_iterator as _bi
    for x, y in _bi(*data["test"], 32, shuffle=False,
                    drop_remainder=False):
        m = jax.device_get(tr.eval_step(tr.params, tr.qstate, x, y, key))
        exp_loss += float(m["loss"]); exp_acc += float(m["accuracy"]); n += 1
    cfg_f = QuantConfig.uniform(32, faithful_eval=True)
    model_f = build_model("MNIST", cfg_f)
    tr_f = Trainer(model_f, tc, data)
    tr_f.params, tr_f.qstate = tr.params, tr.qstate
    faithful = tr_f.evaluate()
    # faithful_eval also flips BN to batch stats, so compare against its
    # own per-batch means computed with its own eval_step
    exp_loss_f, exp_acc_f, n_f = 0.0, 0.0, 0
    key_f = jax.random.fold_in(tr_f.base_key, 0xE7A1)
    for x, y in _bi(*data["test"], 32, shuffle=False,
                    drop_remainder=False):
        m = jax.device_get(tr_f.eval_step(tr_f.params, tr_f.qstate,
                                          x, y, key_f))
        exp_loss_f += float(m["loss"])
        exp_acc_f += float(m["accuracy"])
        n_f += 1
    assert faithful["loss"] == pytest.approx(exp_loss_f / n_f, rel=1e-6)
    assert faithful["accuracy"] == pytest.approx(exp_acc_f / n_f, rel=1e-6)
