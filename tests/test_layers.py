"""Layer-level parity vs a hand-derived NumPy oracle of the reference
semantics (deterministic rounding for exactness)."""

import jax
import jax.numpy as jnp
import numpy as np

import oracle
from lbt_tpu.config import QuantConfig
from lbt_tpu.nn import (
    AvgPool,
    BatchNorm,
    Conv2d,
    Dense,
    Dropout,
    Flatten,
    GradientBuffer,
    MaxPool,
    ReLU,
    ResidualBlock,
    ResidualBottleneck,
)
from lbt_tpu.nn.core import Ctx, finalize, make_sinks

DET = dict(stochastic=False)


def _setup(layer):
    finalize(layer)
    params, qstate = layer.init(jax.random.key(0))
    sinks = make_sinks(layer)
    return params, qstate, sinks


def test_dense_forward_matches_oracle():
    cfg = QuantConfig.uniform(8, **DET)
    layer = Dense("d", cfg, 12, 7)
    params, qstate, sinks = _setup(layer)
    x = np.random.default_rng(0).normal(0, 2, (5, 12)).astype(np.float32)

    y, _ = jax.jit(
        lambda p, q, s, x: layer.apply(p, q, s, x, Ctx(False, None))
    )(params, qstate, sinks, x)

    W = np.asarray(params["W"])
    b = np.asarray(params["b"])
    want = (oracle.quantize(x, 8, 2) @ oracle.quantize(W, 8, 2)
            + oracle.quantize(b, 8, 2))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6, atol=1e-6)


def test_dense_backward_matches_oracle():
    """dW = Xq^T @ gq, db = sum(gq), dX = gq @ Wq^T with gq the
    once-quantized output cotangent (reference
    dynamic_fixed_point.py:441-460)."""
    cfg = QuantConfig.uniform(8, **DET)
    layer = Dense("d", cfg, 6, 4)
    params, qstate, sinks = _setup(layer)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 2, (3, 6)).astype(np.float32)
    g = rng.normal(0, 1, (3, 4)).astype(np.float32)

    def f(p, s, x):
        y, _ = layer.apply(p, qstate, s, x, Ctx(True, jax.random.key(0),
                                                update=False))
        return jnp.vdot(y, g)

    gp, gs, dx = jax.grad(f, argnums=(0, 1, 2))(params, sinks, x)

    W = np.asarray(params["W"])
    Xq = oracle.quantize(x, 8, 2)
    Wq = oracle.quantize(W, 8, 2)
    gq = oracle.quantize(g, 8, 2)
    np.testing.assert_allclose(np.asarray(gp["W"]), Xq.T @ gq, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp["b"]), gq.sum(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx), gq @ Wq.T, atol=1e-5)
    # sink cotangent = overflow stats of the float cotangent g: at the
    # default target 0 the framework emits any-overflow *indicators*
    # (lbt_tpu.dfxp.quantize.overflow_stats), decision-equivalent to the
    # oracle's exact rates — positive iff the rate is positive.
    ovf, ovf2 = oracle.overflow_rates(g, 8, 2)
    got = np.asarray(gs["grad"])
    assert (got[0] > 0) == (ovf > 0)
    assert (got[1] > 0) == (ovf2 > 0)


def test_dense_exponent_controller_updates():
    cfg = QuantConfig.uniform(8, **DET)
    layer = Dense("d", cfg, 4, 4)
    params, qstate, sinks = _setup(layer)
    # huge inputs overflow at exp=2 -> x exponent widens
    x = np.full((2, 4), 100.0, np.float32)
    _, q1 = layer.apply(params, qstate, sinks, x, Ctx(True, jax.random.key(0)))
    assert int(q1["exp"]["x"]) == 3
    # tiny inputs -> tighten
    x = np.full((2, 4), 1e-4, np.float32)
    _, q2 = layer.apply(params, qstate, sinks, x, Ctx(True, jax.random.key(0)))
    assert int(q2["exp"]["x"]) == 1
    # eval: no update
    _, q3 = layer.apply(params, qstate, sinks, x, Ctx(False, None))
    assert int(q3["exp"]["x"]) == 2


def test_conv_forward_matches_oracle_via_lax():
    cfg = QuantConfig.uniform(8, **DET)  # conv acts at 9 bits
    layer = Conv2d("c", cfg, (3, 3, 2, 4), (1, 1), "SAME")
    params, qstate, sinks = _setup(layer)
    x = np.random.default_rng(2).normal(0, 1.5, (2, 8, 8, 2)).astype(
        np.float32)
    y, _ = layer.apply(params, qstate, sinks, x, Ctx(False, None))

    from jax import lax
    xq = oracle.quantize(x, 9, 2)
    wq = oracle.quantize(np.asarray(params["W"]), 8, 2)
    bq = oracle.quantize(np.asarray(params["b"]), 8, 2)
    want = lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = np.asarray(want) + bq
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)


def test_batchnorm_train_and_eval():
    cfg = QuantConfig.uniform(8, **DET)
    bn = BatchNorm("bn", cfg, 3)
    params, qstate, sinks = _setup(bn)
    x = np.random.default_rng(3).normal(1.0, 0.5, (16, 4, 4, 3)).astype(
        np.float32)
    y, q1 = bn.apply(params, qstate, sinks, x, Ctx(True, jax.random.key(0)))
    y = np.asarray(y)
    # batch-normalized output ~ zero-mean/unit-var per channel (gamma=1,
    # beta=0, modulo quantization of the normalized values)
    assert abs(y.mean()) < 0.1
    assert abs(y.std() - 1.0) < 0.1
    # EMA moved toward batch stats
    m = np.asarray(q1["norm"]["state"]["mean"])
    assert np.all(m != 0.0)
    # eval uses running stats (fresh state: mean 0, var 1)
    y2, q2 = bn.apply(params, qstate, sinks, x, Ctx(False, None))
    xq = oracle.quantize(x, 8, 2)
    want = xq / np.sqrt(1.0 + 1e-5)
    got = np.asarray(y2)
    # rescale quantizes the normalized value at 8 bits exp 2
    np.testing.assert_allclose(got, oracle.quantize(want, 8, 2),
                               atol=1e-5)
    # eval does not update state
    np.testing.assert_array_equal(
        np.asarray(q2["norm"]["state"]["mean"]), 0.0)


def test_pools_match_reference_shapes():
    mp = MaxPool(ksize=(3, 3), strides=(2, 2), padding="SAME")
    ap = AvgPool(ksize=(8, 8), strides=(1, 1), padding="VALID")
    finalize(mp), finalize(ap)
    x = np.random.default_rng(4).normal(size=(2, 32, 32, 3)).astype(
        np.float32)
    y, _ = mp.apply({}, {}, {}, x, Ctx(False, None))
    assert y.shape == (2, 16, 16, 3)
    x8 = x[:, :8, :8, :]
    y, _ = ap.apply({}, {}, {}, x8, Ctx(False, None))
    assert y.shape == (2, 1, 1, 3)
    np.testing.assert_allclose(
        np.asarray(y)[:, 0, 0, :], x8.mean(axis=(1, 2)), rtol=1e-5)


def test_avgpool_same_excludes_padding():
    ap = AvgPool(ksize=(2, 2), strides=(2, 2), padding="SAME")
    finalize(ap)
    x = np.ones((1, 3, 3, 1), np.float32)
    y, _ = ap.apply({}, {}, {}, x, Ctx(False, None))
    # corner window has 1 valid element -> average stays 1.0
    np.testing.assert_allclose(np.asarray(y), 1.0)


def test_dropout_train_eval():
    d = Dropout(keep=0.5)
    finalize(d)
    x = np.ones((512, 8), np.float32)
    y, _ = d.apply({}, {}, {}, x, Ctx(True, jax.random.key(0)))
    y = np.asarray(y)
    kept = (y != 0).mean()
    assert 0.4 < kept < 0.6
    np.testing.assert_allclose(y[y != 0], 2.0)  # inverted scaling
    y2, _ = d.apply({}, {}, {}, x, Ctx(False, None))
    np.testing.assert_array_equal(np.asarray(y2), x)


def test_gradient_buffer_error_feedback():
    cfg = QuantConfig.uniform(8, **DET)
    gb = GradientBuffer("gb", cfg, (4, 8))
    params, qstate, sinks = _setup(gb)
    g = np.random.default_rng(5).normal(0, 0.01, (4, 8)).astype(np.float32)

    def f(x, s):
        y, _ = gb.apply({}, qstate, s, x, Ctx(True, jax.random.key(0)))
        return jnp.vdot(y, g)

    x = np.zeros((4, 8), np.float32)
    dx, ds = jax.grad(f, argnums=(0, 1))(x, sinks)
    gq = oracle.quantize(g, 8, 2)
    np.testing.assert_allclose(np.asarray(dx), gq, atol=1e-6)
    # buffer received the quantization residual
    np.testing.assert_allclose(np.asarray(ds["buffer"]), g - gq, atol=1e-6)
    # absorbing the sinks installs the buffer + steps the grad exponent
    q2 = gb.absorb_sinks(qstate, ds)
    np.testing.assert_allclose(np.asarray(q2["state"]["buffer"]), g - gq,
                               atol=1e-6)


def test_residual_block_shapes_and_shortcut():
    cfg = QuantConfig.uniform(8, **DET)
    b1 = ResidualBlock("b1", cfg, 16, 16, stride=1)
    assert len(b1.shortcut.layers) == 0  # identity shortcut
    b2 = ResidualBlock("b2", cfg, 16, 32, stride=2)
    assert len(b2.shortcut.layers) == 2  # 1x1 conv + bn
    finalize(b2)
    params, qstate = b2.init(jax.random.key(0))
    sinks = make_sinks(b2)
    x = np.random.default_rng(6).normal(size=(2, 8, 8, 16)).astype(
        np.float32)
    y, _ = b2.apply(params, qstate, sinks, x, Ctx(True, jax.random.key(1)))
    assert y.shape == (2, 4, 4, 32)
    assert np.all(np.asarray(y) >= 0)  # final relu


def test_bottleneck_expansion():
    cfg = QuantConfig.uniform(8, **DET)
    b = ResidualBottleneck("b", cfg, 64, 64, stride=2)
    finalize(b)
    params, qstate = b.init(jax.random.key(0))
    sinks = make_sinks(b)
    x = np.random.default_rng(7).normal(size=(2, 8, 8, 64)).astype(
        np.float32)
    y, _ = b.apply(params, qstate, sinks, x, Ctx(True, jax.random.key(1)))
    assert y.shape == (2, 4, 4, 256)


def test_fused_batchnorm_matches_split_at_fp32():
    import dataclasses
    base = QuantConfig.fp32()
    x = np.random.default_rng(9).normal(1.0, 0.7, (16, 4, 4, 3)).astype(
        np.float32)
    outs = []
    for fused in (False, True):
        cfg = dataclasses.replace(base, fused_bn=fused)
        bn = BatchNorm("bn", cfg, 3)
        params, qstate, sinks = _setup(bn)
        y, _ = bn.apply(params, qstate, sinks, x, Ctx(True, None))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)


def test_fused_batchnorm_quantized_close_to_split():
    # one fewer quantization -> not identical, but within a quant step
    cfg_split = QuantConfig.uniform(8, **DET)
    import dataclasses
    cfg_fused = dataclasses.replace(cfg_split, fused_bn=True)
    x = np.random.default_rng(10).normal(0.5, 0.5, (32, 4, 4, 3)).astype(
        np.float32)
    ys = []
    for cfg in (cfg_split, cfg_fused):
        bn = BatchNorm("bn", cfg, 3)
        params, qstate, sinks = _setup(bn)
        y, _ = bn.apply(params, qstate, sinks, x,
                        Ctx(True, jax.random.key(0)))
        ys.append(np.asarray(y))
    step = 2.0 ** -(8 - 1 - 2)  # exp 2 grid
    assert np.max(np.abs(ys[0] - ys[1])) <= step + 1e-6


def test_fused_batchnorm_trains():
    import dataclasses
    from lbt_tpu.config import TrainConfig
    from lbt_tpu.nn import Conv2d, Dense, Flatten, ReLU
    from lbt_tpu.nn.model import Model
    from lbt_tpu.train.optim import momentum_init
    from lbt_tpu.train.step import make_train_step
    cfg = dataclasses.replace(QuantConfig.uniform(8), fused_bn=True)
    model = Model("toy", [
        Conv2d("c1", cfg, (3, 3, 3, 8), use_bias=False),
        BatchNorm("bn1", cfg, 8),
        ReLU(),
        Flatten(),
        Dense("d1", cfg, 8 * 8 * 8, 4),
    ], input_shape=(8, 8, 3), num_classes=4, cfg=cfg)
    tc = TrainConfig(lr=0.05, batch_size=32)
    step_fn = make_train_step(model, tc)
    params, qstate = model.init(jax.random.key(0))
    vel = momentum_init(params)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (32, 8, 8, 3)).astype(np.float32)
    y = rng.integers(0, 4, (32,)).astype(np.int32)
    losses = []
    for i in range(30):
        params, qstate, vel, m = step_fn(
            params, qstate, vel, x, y, i, jnp.float32(0.05),
            jax.random.key(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.6, losses[::10]


def test_space_to_depth_embeds_stride2_conv():
    """The s2d stem (QuantConfig.stem_s2d) is exact as a function-class
    embedding: any 7x7/stride-2 SAME conv on [B,224,224,3] equals a
    4x4/stride-1 conv with pads (1,2) on the 2x2 space-to-depth
    rearrange, with kernel w2[jh+1, jw+1, (ph*2+pw)*3+c, o] =
    w[2*jh+ph+2, 2*jw+pw+2, c, o] (tap offset k-2 = 2*j'+p)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from lbt_tpu.config import QuantConfig
    from lbt_tpu.nn.layers import SpaceToDepth
    from lbt_tpu.nn.core import Ctx

    rng = np.random.default_rng(0)
    H = 16  # any even size; SAME k7 s2 pads (2,3) like 224
    x = jnp.asarray(rng.normal(0, 1, (2, H, H, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 1, (7, 7, 3, 5)).astype(np.float32))

    y_ref = lax.conv_general_dilated(
        x, w, (2, 2), [(2, 3), (2, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    s2d = SpaceToDepth(block=2)
    x2, _ = s2d.apply({}, {}, None, x, Ctx(train=False))
    assert x2.shape == (2, H // 2, H // 2, 12)

    # embed the 7x7 kernel: offset o = k - 2 = 2*j' + p, j' in [-1,2]
    w2 = np.zeros((4, 4, 12, 5), np.float32)
    for kh in range(7):
        for kw in range(7):
            jh, ph = divmod(kh - 2, 2)
            jw, pw = divmod(kw - 2, 2)
            w2[jh + 1, jw + 1, (ph * 2 + pw) * 3:(ph * 2 + pw) * 3 + 3]\
                = np.asarray(w[kh, kw])
    y_s2d = lax.conv_general_dilated(
        x2, jnp.asarray(w2), (1, 1), [(1, 2), (1, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert y_s2d.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_stem_s2d_model_builds_and_steps():
    """imagenet_resnet with stem_s2d trains a step and matches the
    conv7 stem's output geometry."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lbt_tpu.config import QuantConfig, TrainConfig
    from lbt_tpu.models import imagenet_resnet
    from lbt_tpu.train.optim import momentum_init
    from lbt_tpu.train.step import make_train_step

    cfg = dataclasses.replace(
        QuantConfig.uniform(8, engine="int8", noise_mode="hash"),
        fused_bn=True, conv_act_extra=0, stem_s2d=True)
    model = imagenet_resnet(cfg, 50, num_classes=10, image_size=32)
    params, qstate = model.init(jax.random.key(0))
    assert params["conv1"]["W"].shape == (4, 4, 12, 64)
    vel = momentum_init(params)
    step = make_train_step(model, TrainConfig(batch_size=4))
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (4, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    _, _, _, m = step(params, qstate, vel, x, y, 0, jnp.float32(0.01),
                      jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
