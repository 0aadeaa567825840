"""Model zoo: every registry entry builds, runs forward, and has the
reference's architecture invariants."""

import jax
import numpy as np
import pytest

from lbt_tpu.config import QuantConfig
from lbt_tpu.models import MODEL_REGISTRY, build_model
from lbt_tpu.models.zoo import MODEL_DATASET
from lbt_tpu.nn.core import Ctx

SMALL = [
    ("PI_MNIST", (784,)),
    ("MNIST", (28, 28, 1)),
    ("CIFAR10", (32, 32, 3)),
    ("CIFAR10_Resnet20", (32, 32, 3)),
]


@pytest.mark.parametrize("name,shape", SMALL)
def test_model_forward(name, shape):
    cfg = QuantConfig.uniform(8)
    model = build_model(name, cfg)
    params, qstate = model.init(jax.random.key(0))
    sinks = model.make_sinks()
    x = np.random.default_rng(0).normal(size=(2,) + shape).astype(
        np.float32)

    logits, new_q = jax.jit(
        lambda p, q, s, x, k: model.apply(p, q, s, x, Ctx(True, k))
    )(params, qstate, sinks, x, jax.random.key(1))
    assert logits.shape == (2, model.num_classes)
    assert np.all(np.isfinite(np.asarray(logits)))
    # state structure is preserved
    assert jax.tree_util.tree_structure(new_q) == \
        jax.tree_util.tree_structure(qstate)


def test_registry_covers_reference_models():
    # the reference registry (main.py:83-103) has exactly these
    for name in ["PI_MNIST", "MNIST", "CIFAR10", "CIFAR10_VGG",
                 "CIFAR10_Resnet20", "CIFAR10_Resnet32",
                 "CIFAR10_Resnet44", "CIFAR10_Resnet56"]:
        assert name in MODEL_REGISTRY
        assert name in MODEL_DATASET


def test_resnet20_structure():
    cfg = QuantConfig.uniform(8)
    model = build_model("CIFAR10_Resnet20", cfg)
    params, _ = model.init(jax.random.key(0))
    # bias-free stem + head (reference models.py:398-437)
    assert "b" not in params["00_conv2d"] if "00_conv2d" in params else True
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(getattr(p, "key", str(p)) for p in path)
             for path, _ in leaves]
    convs = [n for n in names if n.endswith("/W")]
    # resnet-20: 1 stem + 3 stages x 3 blocks x 2 convs + 2 shortcut convs
    # + 1 dense head = 22 weight tensors
    assert len(convs) == 22, sorted(names)
    assert not any("softmax/b" in n for n in names)  # bias-free head


def test_decay_tree_matches_params():
    cfg = QuantConfig.uniform(8)
    model = build_model("CIFAR10_Resnet20", cfg)
    params, _ = model.init(jax.random.key(0))
    decay = model.decay_tree()
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, params)) == \
        jax.tree_util.tree_structure(jax.tree.map(lambda _: 0, decay))


def test_fp32_passthrough_model_has_no_quant_state():
    model = build_model("MNIST", QuantConfig.fp32())
    _, qstate = model.init(jax.random.key(0))
    exps = [leaf for path, leaf in
            jax.tree_util.tree_flatten_with_path(qstate)[0]
            if any(getattr(p, "key", "") == "exp" for p in path)]
    assert exps == []
    assert model.make_sinks() == {} or not jax.tree.leaves(
        model.make_sinks())


@pytest.mark.slow
def test_mixed_bitwidth_int4_weights():
    cfg = QuantConfig(bits_w=4, bits_a=8, bits_g=8)
    model = build_model("CIFAR10_VGG", cfg)
    params, qstate = model.init(jax.random.key(0))
    sinks = model.make_sinks()
    x = np.zeros((2, 32, 32, 3), np.float32)
    logits, _ = jax.jit(
        lambda p, q, s, x, k: model.apply(p, q, s, x, Ctx(False, k))
    )(params, qstate, sinks, x, jax.random.key(1))
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.slow
def test_resnet_gradient_buffer_sites():
    """Error-feedback GradientBuffers at the reference's commented-out
    sites (reference models.py:407-411,438-442) are insertable and live."""
    import jax.numpy as jnp
    from lbt_tpu.config import TrainConfig
    from lbt_tpu.models.zoo import cifar10_resnet
    from lbt_tpu.train.optim import momentum_init
    from lbt_tpu.train.step import make_train_step

    cfg = QuantConfig.uniform(8)
    model = cifar10_resnet(cfg, 20, gradient_buffer_batch=8)
    params, qstate = model.init(jax.random.key(0))
    assert "grad-buffer-stem" in qstate
    assert qstate["grad-buffer-stem"]["state"]["buffer"].shape == \
        (8, 32, 32, 16)
    vel = momentum_init(params)
    step = make_train_step(model, TrainConfig(batch_size=8))
    x = np.random.default_rng(0).normal(
        0, 1, (8, 32, 32, 3)).astype(np.float32)
    y = np.zeros(8, np.int32)
    params, qstate, vel, m = step(params, qstate, vel, x, y, 0,
                                  jnp.float32(0.01), jax.random.key(1))
    # backward filled the buffers with quantization residuals
    assert float(jnp.abs(
        qstate["grad-buffer-stem"]["state"]["buffer"]).max()) > 0
    assert float(jnp.abs(
        qstate["grad-buffer-head"]["state"]["buffer"]).max()) >= 0
    assert np.isfinite(float(m["loss"]))


def test_initial_exponent_g_cold_start_knob():
    """QuantConfig.initial_exponent_g re-bases ONLY the gradient sites'
    cold-start exponents (the ImageNet walk-down fix, config.py); all
    other sites keep the reference init of 2
    (reference dynamic_fixed_point.py:131)."""
    import dataclasses
    cfg = dataclasses.replace(QuantConfig.uniform(8),
                              initial_exponent_g=-10)
    model = build_model("Imagenet_Resnet18", cfg, num_classes=10,
                        image_size=64)
    _, qstate = model.init(jax.random.key(0))
    leaves = jax.tree_util.tree_flatten_with_path(qstate)[0]
    n_grad = n_other = 0
    for path, leaf in leaves:
        keys = [getattr(p, "key", str(p)) for p in path]
        if "exp" not in keys:
            continue
        if keys[-1] == "grad":
            assert int(leaf) == -10, keys
            n_grad += 1
        else:
            assert int(leaf) == 2, keys
            n_other += 1
    assert n_grad > 10 and n_other > 10
    # default None preserves reference semantics at every site
    model2 = build_model("Imagenet_Resnet18", QuantConfig.uniform(8),
                         num_classes=10, image_size=64)
    _, q2 = model2.init(jax.random.key(0))
    for path, leaf in jax.tree_util.tree_flatten_with_path(q2)[0]:
        keys = [getattr(p, "key", str(p)) for p in path]
        if "exp" in keys:
            assert int(leaf) == 2, keys


@pytest.mark.slow
def test_imagenet_grad_cold_start_dynamics():
    """The mechanism behind the ImageNet-model DFXP-8 collapse (round-5
    finding, BENCH_NOTES): with the reference grad-exponent init of 2,
    stochastic rounding of sub-LSB early cotangents injects sparse
    +/-LSB spikes during the controller's one-step-per-step walk-down,
    blowing up the conv weight norms within the first ~30 steps
    (BatchNorm then hides it from the train loss while eval explodes).
    initial_exponent_g=-10 removes the injection; weight norms stay
    near their fp32 trajectory."""
    import dataclasses
    from lbt_tpu.config import TrainConfig
    from lbt_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 64, 64, 3)).astype(np.float32)
    y = rng.integers(0, 10, 64).astype(np.int32)
    data = {"train": (x, y), "test": (x[:16], y[:16]), "synthetic": True,
            "num_classes": 10}

    def conv1_norm(init_g):
        cfg = dataclasses.replace(
            QuantConfig.uniform(8, engine="sim"),
            bits_w=32, bits_a=32, bits_b=32, conv_act_extra=0,
            bn_momentum=0.99, initial_exponent_g=init_g)
        model = build_model("Imagenet_Resnet18", cfg, num_classes=10,
                            image_size=64)
        tc = TrainConfig(lr=0.01, batch_size=16, n_epoch=1,
                         lr_decay_epochs=(100,), log_every=1000, seed=0)
        tr = Trainer(model, tc, data, augment=None)
        tr.train_epoch(0)  # 4 steps... need more: 64/16 = 4 steps/epoch
        for ep in range(1, 8):
            tr.epoch += 1
            tr.train_epoch(ep)
        w = tr.params["conv1"]["W"] if "conv1" in tr.params else None
        if w is None:  # prefixed param naming
            leaves = jax.tree_util.tree_flatten_with_path(tr.params)[0]
            for path, leaf in leaves:
                name = "/".join(getattr(p, "key", str(p)) for p in path)
                if name.endswith("conv1/W") and "stage" not in name:
                    w = leaf
                    break
        return float(np.linalg.norm(np.asarray(w)))

    n_bad = conv1_norm(2)       # reference init: noise-injection regime
    n_good = conv1_norm(-10)    # fix: no injection
    # fp32-init conv1 norm is ~8.3; the injection regime multiplies it
    assert n_bad > 2.5 * n_good, (n_bad, n_good)
    assert n_good < 12.0, n_good
