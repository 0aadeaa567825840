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
