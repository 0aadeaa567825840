"""Distributed correctness on a simulated 8-device CPU mesh
(SURVEY.md §4: DP-sharded step vs single-device step, low-bit all-reduce
with error feedback, GSPMD tp sharding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.nn import Dense, ReLU
from lbt_tpu.nn.model import Model
from lbt_tpu.parallel.dp import make_dp_train_step
from lbt_tpu.parallel.lowbit import init_error_buffers, lowbit_allreduce
from lbt_tpu.parallel.mesh import make_mesh, param_pspecs, to_shardings
from lbt_tpu.train.optim import momentum_init
from lbt_tpu.train.step import make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _toy_model(engine="int8", stochastic=False):
    cfg = QuantConfig.uniform(8, engine=engine, stochastic=stochastic)
    return Model("toy", [
        Dense("d1", cfg, 20, 64),
        ReLU(),
        Dense("d2", cfg, 64, 4),
    ], input_shape=(20,), num_classes=4, cfg=cfg)


def _data(n=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, 20)).astype(np.float32)
    y = rng.integers(0, 4, n).astype(np.int32)
    return x, y


def test_dp_step_matches_single_device():
    model = _toy_model(stochastic=False)
    tc = TrainConfig(lr=0.05, batch_size=64)
    mesh = make_mesh(data=8, model=1)

    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    x, y = _data()

    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731
    single = make_train_step(model, tc)
    p1, q1, v1 = copy(params), copy(qstate), copy(vel)
    for i in range(3):
        p1, q1, v1, m1 = single(p1, q1, v1, x, y, i, jnp.float32(0.05),
                                jax.random.key(9))

    dp = make_dp_train_step(model, tc, mesh, lowbit_bits=None)
    ebuf = init_error_buffers(params)
    p2, q2, v2 = copy(params), copy(qstate), copy(vel)
    for i in range(3):
        p2, q2, v2, ebuf, m2 = dp(p2, q2, v2, ebuf, x, y,
                                  jnp.int32(i), jnp.float32(0.05),
                                  jax.random.key(9))

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(q1), jax.tree.leaves(q2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)


def test_dp_gated_cadence_matches_single_device():
    """range_update_every under shard_map: the gated DP step (lax.cond
    around the overflow reductions, pmean outside the cond) must track
    the gated single-device step exactly."""
    import dataclasses

    cfg = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", stochastic=False),
        range_update_every=2)
    model = Model("toy", [
        Dense("d1", cfg, 20, 64),
        ReLU(),
        Dense("d2", cfg, 64, 4),
    ], input_shape=(20,), num_classes=4, cfg=cfg)
    tc = TrainConfig(lr=0.05, batch_size=64)
    mesh = make_mesh(data=8, model=1)

    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    x, y = _data()
    x = x * 50.0  # force controller movement on gated-on steps

    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731
    single = make_train_step(model, tc)
    p1, q1, v1 = copy(params), copy(qstate), copy(vel)
    for i in range(4):
        p1, q1, v1, _ = single(p1, q1, v1, x, y, i, jnp.float32(0.05),
                               jax.random.key(9))

    dp = make_dp_train_step(model, tc, mesh, lowbit_bits=None)
    ebuf = init_error_buffers(params)
    p2, q2, v2 = copy(params), copy(qstate), copy(vel)
    for i in range(4):
        p2, q2, v2, ebuf, _ = dp(p2, q2, v2, ebuf, x, y,
                                 jnp.int32(i), jnp.float32(0.05),
                                 jax.random.key(9))

    for a, b in zip(jax.tree.leaves(q1), jax.tree.leaves(q2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # the exponents did move (on gated-on steps) for the huge inputs
    assert int(q2["d1"]["exp"]["x"]) != int(qstate["d1"]["exp"]["x"])


def test_dp_lowbit_step_trains():
    model = _toy_model(stochastic=False)
    tc = TrainConfig(lr=0.05, batch_size=64)
    mesh = make_mesh(data=8, model=1)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    ebuf = init_error_buffers(params)
    x, y = _data(512)
    dp = make_dp_train_step(model, tc, mesh, lowbit_bits=8)
    losses = []
    for i in range(80):
        s = slice((i * 64) % 512, (i * 64) % 512 + 64)
        params, qstate, vel, ebuf, m = dp(
            params, qstate, vel, ebuf, x[s], y[s],
            jnp.int32(i), jnp.float32(0.05), jax.random.key(1))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-8:]) < losses[0] * 0.7, losses[::16]
    # error buffers are live (non-zero residuals)
    assert any(float(jnp.max(jnp.abs(b))) > 0
               for b in jax.tree.leaves(ebuf))


def test_lowbit_allreduce_unbiased_over_time():
    """Error feedback: the *running sum* of quantized means converges to
    the running sum of true means (the residual never exceeds one grid
    step per leaf)."""
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(0)
    shard_grads = rng.normal(0, 1e-3, (8, 16)).astype(np.float32)
    true_mean = shard_grads.mean(axis=0)

    def step(g, buf):
        mean, res = lowbit_allreduce({"w": g}, {"w": buf}, "data", bits=8, reduce="mean")
        return mean["w"], res["w"]

    f = jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P("data")), check_vma=False))

    buf = jnp.zeros((8, 16), jnp.float32)  # per-shard buffers
    acc = np.zeros(16, np.float64)
    g_dev = jnp.asarray(shard_grads)
    for t in range(50):
        mean, buf = f(g_dev, buf)
        acc += np.asarray(mean).reshape(-1)[:16]
    # cumulative drift stays bounded by ~one quantization step, so the
    # time-averaged gradient is unbiased
    drift = np.abs(acc / 50 - true_mean).max()
    naive = np.abs(np.asarray(mean).reshape(-1)[:16] - true_mean).max()
    assert drift < 2e-5, (drift, naive)


def test_lowbit_allreduce_exact_for_grid_values():
    mesh = make_mesh(data=8, model=1)
    # all-shards-equal powers of two are exactly representable
    g = jnp.broadcast_to(
        jnp.array([0.5, -0.25, 0.125, 0.0], jnp.float32), (8, 4))

    def step(g, buf):
        mean, res = lowbit_allreduce({"w": g}, {"w": buf}, "data", bits=8, reduce="mean")
        return mean["w"], res["w"]

    f = jax.shard_map(step, mesh=mesh, in_specs=(P("data"), P("data")),
                      out_specs=(P(), P("data")), check_vma=False)
    mean, res = f(g, jnp.zeros((8, 4)))
    np.testing.assert_array_equal(
        np.asarray(mean).reshape(-1), np.asarray(g)[0])
    np.testing.assert_array_equal(np.asarray(res), 0.0)


def test_tp_sharded_jit_step_runs():
    """GSPMD: weights sharded over 'model', batch over 'data'."""
    model = _toy_model(stochastic=False)
    # make d2 large enough to trigger the tp sharding rule
    cfg = model.cfg
    model = Model("toy", [
        Dense("d1", cfg, 20, 256),
        ReLU(),
        Dense("d2", cfg, 256, 128),
        ReLU(),
        Dense("d3", cfg, 128, 4),
    ], input_shape=(20,), num_classes=4, cfg=cfg)
    tc = TrainConfig(lr=0.05, batch_size=32)
    mesh = make_mesh(data=4, model=2)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    pspecs = param_pspecs(params)
    # at least one leaf must actually be model-sharded
    assert any("model" in str(s) for s in jax.tree.leaves(
        pspecs, is_leaf=lambda s: isinstance(s, P)))
    sh = to_shardings(mesh, pspecs)
    params = jax.device_put(params, sh)
    vel = jax.device_put(vel, sh)
    qstate = jax.device_put(qstate, NamedSharding(mesh, P()))
    x, y = _data(32)
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    step = jax.jit(make_train_step(model, tc, jit=False))
    p, q, v, m = step(params, qstate, vel, x, jnp.asarray(y),
                      jnp.int32(0), jnp.float32(0.05), jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def _tp_equiv_check(model, mesh, n_steps=3, stochastic=False,
                    batch=32, rtol=1e-5, atol=1e-6):
    """GSPMD-sharded train step vs single-device step: params + exponents
    must track (exponents exactly; floats to tolerance).  The sharded fn
    is the SAME make_train_step closure jitted over device_put-sharded
    operands — GSPMD partitions the contractions and inserts the
    collectives (VERDICT round-2 task 4: same rigor as the DP test)."""
    tc = TrainConfig(lr=0.05, batch_size=batch)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    rng = np.random.default_rng(1)
    shape = (batch,) + model.input_shape
    x = rng.normal(0, 1, shape).astype(np.float32)
    y = rng.integers(0, model.num_classes, batch).astype(np.int32)

    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731
    single = make_train_step(model, tc)
    p1, q1, v1 = copy(params), copy(qstate), copy(vel)
    for i in range(n_steps):
        p1, q1, v1, m1 = single(p1, q1, v1, x, y, i, jnp.float32(0.05),
                                jax.random.key(9))

    pspecs = param_pspecs(params)
    assert any("model" in str(s) for s in jax.tree.leaves(
        pspecs, is_leaf=lambda s: isinstance(s, P))), "nothing tp-sharded"
    sh = to_shardings(mesh, pspecs)
    p2 = jax.device_put(copy(params), sh)
    v2 = jax.device_put(copy(vel), sh)
    q2 = jax.device_put(copy(qstate), NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ys = jax.device_put(np.asarray(y), NamedSharding(mesh, P("data")))
    step = jax.jit(make_train_step(model, tc, jit=False))
    for i in range(n_steps):
        p2, q2, v2, m2 = step(p2, q2, v2, xs, ys, jnp.int32(i),
                              jnp.float32(0.05), jax.random.key(9))

    # exponent state: integer controllers, must agree exactly
    for a, b in zip(jax.tree.leaves(q1), jax.tree.leaves(q2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=rtol)


def test_tp_dense_step_matches_single_device():
    """Pure TP (model=8): deterministic dense toy, 3 steps."""
    cfg = QuantConfig.uniform(8, engine="int8", stochastic=False)
    model = Model("toy", [
        Dense("d1", cfg, 20, 256),
        ReLU(),
        Dense("d2", cfg, 256, 128),
        ReLU(),
        Dense("d3", cfg, 128, 4),
    ], input_shape=(20,), num_classes=4, cfg=cfg)
    _tp_equiv_check(model, make_mesh(data=1, model=8))


@pytest.mark.slow
def test_tp_conv_model_matches_single_device():
    """TP on a conv+BN model (Cout sharded over 'model'), dp x tp 2x4."""
    from lbt_tpu.nn import AvgPool, BatchNorm, Conv2d, Flatten
    cfg = QuantConfig.uniform(8, engine="int8", stochastic=False)
    model = Model("convtoy", [
        Conv2d("c1", cfg, (3, 3, 3, 64), use_bias=False),
        BatchNorm("bn1", cfg, 64),
        ReLU(),
        Conv2d("c2", cfg, (3, 3, 64, 64), use_bias=False),  # tp-sharded
        BatchNorm("bn2", cfg, 64),
        ReLU(),
        AvgPool(ksize=(8, 8), strides=(8, 8)),
        Flatten(dim=64),
        Dense("fc", cfg, 64, 4),
    ], input_shape=(8, 8, 3), num_classes=4, cfg=cfg)
    _tp_equiv_check(model, make_mesh(data=2, model=4), batch=16)


@pytest.mark.slow
def test_tp_dp_stochastic_exponents_match():
    """dp x tp 4x2 with stochastic hash rounding: the counter-hash noise
    is a function of (key, element index) only, so the sharded step must
    reproduce the single-device trajectory exactly at the integer level
    (exponents) and to float tolerance on params."""
    cfg = QuantConfig.uniform(8, engine="int8", noise_mode="hash")
    model = Model("toy", [
        Dense("d1", cfg, 20, 256),
        ReLU(),
        Dense("d2", cfg, 256, 128),
        ReLU(),
        Dense("d3", cfg, 128, 4),
    ], input_shape=(20,), num_classes=4, cfg=cfg)
    _tp_equiv_check(model, make_mesh(data=4, model=2))


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    logits = jax.jit(fn)(*args)
    assert logits.shape[-1] == 10
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_trainer_data_parallel_end_to_end():
    """Trainer with data_parallel + lowbit_allreduce on the virtual mesh."""
    from lbt_tpu.data.datasets import load_dataset
    from lbt_tpu.train.trainer import Trainer

    cfg = QuantConfig.uniform(8)
    from lbt_tpu.models import build_model
    model = build_model("PI_MNIST", cfg)
    tc = TrainConfig(batch_size=64, n_epoch=1, log_every=1000,
                     data_parallel=True, lowbit_allreduce=True)
    data = load_dataset("pi_mnist", n_train=256, n_test=128)
    tr = Trainer(model, tc, data)
    assert tr.dp
    l0 = tr.evaluate()["loss"]
    tr.train_epoch(0)
    ev = tr.evaluate()
    assert np.isfinite(ev["loss"])
    assert ev["loss"] < l0 * 1.2  # trains without blowing up
    # error buffers live
    assert any(float(jnp.max(jnp.abs(b))) > 0
               for b in jax.tree.leaves(tr.ebuf))


def test_ring_lowbit_int16_matches_psum():
    """int16-wire ring all-reduce is bit-identical to the psum variant."""
    from lbt_tpu.parallel.lowbit import ring_lowbit_allreduce
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(4)
    g = {"w": rng.normal(0, 1e-2, (8, 40)).astype(np.float32),
         "b": rng.normal(0, 1e-3, (8, 7)).astype(np.float32)}
    buf = jax.tree.map(jnp.zeros_like, g)

    def ring(g, buf):
        return ring_lowbit_allreduce(g, buf, "data", 8, bits=8,
                                     wire="int16", reduce="mean")

    def psum(g, buf):
        return lowbit_allreduce(g, buf, "data", bits=8, reduce="mean",
                                num_shards=8)

    specs = dict(in_specs=(P("data"), P("data")),
                 out_specs=(P(), P("data")), check_vma=False)
    r_mean, r_res = jax.jit(jax.shard_map(ring, mesh=mesh, **specs))(g, buf)
    p_mean, p_res = jax.jit(jax.shard_map(psum, mesh=mesh, **specs))(g, buf)
    for a, b in zip(jax.tree.leaves(r_mean), jax.tree.leaves(p_mean)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(r_res), jax.tree.leaves(p_res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ring_lowbit_int8_wire_unbiased():
    """int8-wire ring (log2 N coarser grid): bounded error per step,
    unbiased over time through the error feedback."""
    from lbt_tpu.parallel.lowbit import ring_lowbit_allreduce
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(5)
    shard_grads = rng.normal(0, 1e-3, (8, 32)).astype(np.float32)
    true_mean = shard_grads.mean(axis=0)

    def step(g, buf):
        m, r = ring_lowbit_allreduce({"w": g}, {"w": buf}, "data", 8,
                                     bits=8, wire="int8", reduce="mean")
        return m["w"], r["w"]

    f = jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P("data")), check_vma=False))
    buf = jnp.zeros((8, 32), jnp.float32)
    acc = np.zeros(32, np.float64)
    g_dev = jnp.asarray(shard_grads)
    T = 50
    for t in range(T):
        mean, buf = f(g_dev, buf)
        acc += np.asarray(mean).reshape(-1)[:32]
    drift = np.abs(acc / T - true_mean).max()
    assert drift < 1e-4, drift


@pytest.mark.slow
def test_tp_lowbit_interaction():
    """TP x low-bit all-reduce (round-4 VERDICT item 6): the shard_map DP
    step is manual only over 'data' (axis_names), so a dp4 x tp2 mesh
    runs the DFXP-int8 error-feedback collective over 'data' while GSPMD
    partitions the tp-sharded contractions over 'model'.  Must match the
    dp4 (model=1) lowbit run on the same data split: exponents exactly,
    params to float tolerance."""
    cfg = QuantConfig.uniform(8, engine="int8", stochastic=False)
    def mk():
        return Model("toy", [
            Dense("d1", cfg, 20, 256),
            ReLU(),
            Dense("d2", cfg, 256, 128),  # 32k elems -> tp-sharded
            ReLU(),
            Dense("d3", cfg, 128, 4),
        ], input_shape=(20,), num_classes=4, cfg=cfg)
    tc = TrainConfig(lr=0.05, batch_size=32)
    x, y = _data(32)
    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731

    def run(mesh, tp_shard):
        model = mk()
        params, qstate = model.init(jax.random.key(0))
        vel = momentum_init(params)
        ebuf = init_error_buffers(params)
        if tp_shard:
            sh = to_shardings(mesh, param_pspecs(params))
            assert any("model" in str(s) for s in jax.tree.leaves(
                param_pspecs(params),
                is_leaf=lambda s: isinstance(s, P)))
            params = jax.device_put(copy(params), sh)
            vel = jax.device_put(copy(vel), sh)
            ebuf = jax.device_put(copy(ebuf), sh)
        step = make_dp_train_step(model, tc, mesh, lowbit_bits=8,
                                  donate=False)
        for i in range(3):
            params, qstate, vel, ebuf, m = step(
                params, qstate, vel, ebuf, x, y, jnp.int32(i),
                jnp.float32(0.05), jax.random.key(9))
        return params, qstate, m

    p1, q1, m1 = run(make_mesh(data=4, model=1,
                               devices=jax.devices()[:4]), False)
    p2, q2, m2 = run(make_mesh(data=4, model=2), True)

    for a, b in zip(jax.tree.leaves(q1), jax.tree.leaves(q2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)


@pytest.mark.slow
def test_tp_imagenet_resnet50_shapes():
    """TP at ImageNet channel widths (round-4 VERDICT item 6): the real
    ResNet-50 (bottleneck stages to 2048 channels — the widths where
    param_pspecs actually shards many W leaves over 'model') under
    GSPMD dp2 x tp4, equivalence vs single device at reduced spatial
    size/steps (dryrun-grade; a bs128/224 execute is recorded in
    MULTICHIP_NOTES.md)."""
    from lbt_tpu.models import imagenet_resnet
    cfg = QuantConfig.uniform(8, engine="int8", stochastic=False)
    model = imagenet_resnet(cfg, 50, num_classes=16, image_size=32)
    pspecs = param_pspecs(model.init(jax.random.key(0))[0])
    n_tp = sum("model" in str(s) for s in jax.tree.leaves(
        pspecs, is_leaf=lambda s: isinstance(s, P)))
    assert n_tp >= 30, f"only {n_tp} tp-sharded leaves"
    _tp_equiv_check(model, make_mesh(data=2, model=4), n_steps=2,
                    batch=8, rtol=5e-5, atol=1e-5)


def test_trainer_tensor_parallel_knob():
    """TrainConfig.tensor_parallel builds a dp x tp mesh inside the
    Trainer, lays large-W shardings out over 'model', and trains/evals
    end-to-end (round-5 multi-host Trainer work; the step math itself is
    covered by the tp-equivalence tests above)."""
    from lbt_tpu.train.trainer import Trainer

    cfg = QuantConfig.uniform(8, engine="int8", stochastic=False)
    model = Model("tp_toy", [
        Dense("d1", cfg, 20, 256),
        ReLU(),
        Dense("d2", cfg, 256, 512),  # 131k elems > _TP_MIN_ELEMS
        ReLU(),
        Dense("d3", cfg, 512, 4),
    ], input_shape=(20,), num_classes=4, cfg=cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (128, 20)).astype(np.float32)
    w = rng.normal(0, 1, (20, 4)).astype(np.float32)
    y = (x @ w).argmax(-1).astype(np.int32)
    tc = TrainConfig(lr=0.05, batch_size=32, n_epoch=1, log_every=1000,
                     data_parallel=True, tensor_parallel=2,
                     eval_batch_size=48)
    tr = Trainer(model, tc, {"train": (x, y), "test": (x[:100], y[:100])})
    assert tr.mesh.shape == {"data": 4, "model": 2}
    # the big kernel must actually be laid out over 'model'
    sh = tr.params["d2"]["W"].sharding
    assert "model" in (sh.spec[-1] if sh.spec else ()), sh.spec
    ev = tr.train()
    assert 0.0 <= ev["accuracy"] <= 1.0 and np.isfinite(ev["loss"])
