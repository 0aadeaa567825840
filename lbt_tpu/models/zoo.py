"""Model zoo.

Architectures re-derived from the reference model definitions
(reference models.py:57-470) plus ImageNet-class extensions (bottleneck
ResNets, VGG-16) that the reference scoped but never shipped (its orphaned
torchvision pipeline, reference data.py:58-93, and the unused
ResidualBottleneck_q, reference dynamic_fixed_point.py:878-980).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

from lbt_tpu.config import QuantConfig
from lbt_tpu.nn.blocks import ResidualBlock, ResidualBottleneck
from lbt_tpu.nn.layers import (
    AvgPool,
    Conv2d,
    Dense,
    Dropout,
    Flatten,
    GradientBuffer,
    MaxPool,
    ReLU,
    SpaceToDepth,
)
from lbt_tpu.nn.model import Model
from lbt_tpu.nn.norm import BatchNorm


def pi_mnist_mlp(cfg: QuantConfig, dropout_keep: float = 0.5,
                 weight_decay: float = 0.0) -> Model:
    """Permutation-invariant MNIST MLP 784-1024-1024-10
    (reference PI_MNIST_Model, models.py:57-88)."""
    return Model("pi_mnist", [
        Dense("dense1", cfg, 784, 1024, weight_decay=weight_decay),
        ReLU(),
        Dropout(keep=dropout_keep),
        Dense("dense2", cfg, 1024, 1024, weight_decay=weight_decay),
        ReLU(),
        Dropout(keep=dropout_keep),
        Dense("softmax", cfg, 1024, 10, weight_decay=weight_decay),
    ], input_shape=(784,), num_classes=10, cfg=cfg)


def lenet_mnist(cfg: QuantConfig, dropout_keep: float = 0.5,
                weight_decay: float = 0.0) -> Model:
    """LeNet-style MNIST convnet (reference MNIST_Model,
    models.py:91-152)."""
    return Model("lenet_mnist", [
        Conv2d("conv1", cfg, (5, 5, 1, 6), (1, 1), "SAME",
               weight_decay=weight_decay),
        ReLU(),
        MaxPool(ksize=(2, 2), strides=(2, 2), padding="VALID"),
        Conv2d("conv2", cfg, (5, 5, 6, 16), (1, 1), "VALID",
               weight_decay=weight_decay),
        ReLU(),
        MaxPool(ksize=(2, 2), strides=(2, 2), padding="VALID"),
        Conv2d("conv3", cfg, (5, 5, 16, 120), (1, 1), "VALID",
               weight_decay=weight_decay),
        ReLU(),
        Flatten(),
        Dropout(keep=dropout_keep),
        Dense("dense1", cfg, 120, 84, weight_decay=weight_decay),
        ReLU(),
        Dropout(keep=dropout_keep),
        Dense("softmax", cfg, 84, 10, weight_decay=weight_decay),
    ], input_shape=(28, 28, 1), num_classes=10, cfg=cfg)


def cifar10_convnet(cfg: QuantConfig, dropout_keep: float = 0.5,
                    weight_decay: float = 0.0) -> Model:
    """3-stage CIFAR-10 convnet (reference CIFAR10_Model,
    models.py:155-234)."""
    return Model("cifar10_convnet", [
        Conv2d("conv1", cfg, (5, 5, 3, 64), (1, 1), "SAME",
               weight_decay=weight_decay),
        ReLU(),
        MaxPool(ksize=(3, 3), strides=(2, 2), padding="SAME"),
        Dropout(keep=dropout_keep),
        Conv2d("conv2", cfg, (5, 5, 64, 128), (1, 1), "SAME",
               weight_decay=weight_decay),
        ReLU(),
        MaxPool(ksize=(3, 3), strides=(2, 2), padding="SAME"),
        Dropout(keep=dropout_keep),
        Conv2d("conv3", cfg, (5, 5, 128, 128), (1, 1), "SAME",
               weight_decay=weight_decay),
        ReLU(),
        MaxPool(ksize=(3, 3), strides=(2, 2), padding="SAME"),
        Flatten(),
        Dropout(keep=dropout_keep),
        Dense("dense1", cfg, 128 * 4 * 4, 400, weight_decay=weight_decay),
        ReLU(),
        Dropout(keep=dropout_keep),
        Dense("softmax", cfg, 400, 10, weight_decay=weight_decay),
    ], input_shape=(32, 32, 3), num_classes=10, cfg=cfg)


def cifar10_vgg(cfg: QuantConfig, dropout_keep: float = 0.5,
                weight_decay: float = 0.0) -> Model:
    """VGG-style CIFAR-10 net (reference CIFAR10_VGG_Model,
    models.py:237-368)."""
    layers = []
    cin = 3
    for stage, c in enumerate((128, 256, 512), start=1):
        if stage > 1:
            layers.append(Dropout(keep=dropout_keep))
        layers += [
            Conv2d(f"conv{stage}-1", cfg, (3, 3, cin, c), (1, 1), "SAME",
                   weight_decay=weight_decay),
            ReLU(),
            Conv2d(f"conv{stage}-2", cfg, (3, 3, c, c), (1, 1), "SAME",
                   weight_decay=weight_decay),
            ReLU(),
            MaxPool(ksize=(3, 3), strides=(2, 2), padding="SAME"),
        ]
        cin = c
    layers += [
        Flatten(),
        Dropout(keep=dropout_keep),
        Dense("dense1", cfg, 512 * 4 * 4, 1024, weight_decay=weight_decay),
        ReLU(),
        Dropout(keep=dropout_keep),
        Dense("dense2", cfg, 1024, 1024, weight_decay=weight_decay),
        ReLU(),
        Dropout(keep=dropout_keep),
        Dense("softmax", cfg, 1024, 10, weight_decay=weight_decay),
    ]
    return Model("cifar10_vgg", layers, input_shape=(32, 32, 3),
                 num_classes=10, cfg=cfg)


def _res_stage(cfg, name, block_cls, cin, channels, num_blocks, stride,
               weight_decay):
    blocks = []
    for i in range(1, 1 + num_blocks):
        blocks.append(block_cls(
            f"{name}-{i}", cfg, cin, channels,
            stride=stride if i == 1 else 1,
            weight_decay=weight_decay,
        ))
        cin = channels * block_cls.expansion
    return blocks, cin


def cifar10_resnet(cfg: QuantConfig, depth: int = 20,
                   dropout_keep: float = 0.5, weight_decay: float = 0.0,
                   num_classes: int = 10,
                   gradient_buffer_batch: int = 0) -> Model:
    """CIFAR ResNet-{20,32,44,56} (reference CIFAR10_Resnet,
    models.py:371-470): 3x3x16 bias-free stem + BN + ReLU, three stages of
    basic blocks at 16/32/64 channels (strides 1/2/2), 8x8 avgpool, and a
    bias-free 64->num_classes head.

    ``gradient_buffer_batch > 0`` inserts error-feedback GradientBuffer
    layers at the reference's (commented-out) sites — after the stem conv
    and after the softmax dense (reference models.py:407-411,438-442) —
    sized for that fixed batch size (use drop-remainder batches)."""
    assert (depth - 2) % 6 == 0, f"bad CIFAR resnet depth {depth}"
    n = (depth - 2) // 6
    gb = gradient_buffer_batch
    layers = [
        Conv2d("conv1", cfg, (3, 3, 3, 16), (1, 1), "SAME",
               use_bias=False, weight_decay=weight_decay),
    ]
    if gb:
        layers.append(GradientBuffer("grad-buffer-stem", cfg,
                                     (gb, 32, 32, 16)))
    layers += [
        BatchNorm("conv1-bn", cfg, 16, weight_decay=weight_decay),
        ReLU(),
    ]
    cin = 16
    for channels, stride in ((16, 1), (32, 2), (64, 2)):
        stage, cin = _res_stage(
            cfg, f"block{channels}", ResidualBlock, cin, channels, n,
            stride, weight_decay,
        )
        layers += stage
    layers += [
        AvgPool(ksize=(8, 8), strides=(1, 1), padding="VALID"),
        Flatten(),
        Dense("softmax", cfg, 64, num_classes, use_bias=False,
              weight_decay=weight_decay),
    ]
    if gb:
        layers.append(GradientBuffer("grad-buffer-head", cfg,
                                     (gb, num_classes)))
    return Model(f"cifar10_resnet{depth}", layers,
                 input_shape=(32, 32, 3), num_classes=num_classes, cfg=cfg)


_IMAGENET_STAGES = {
    18: (ResidualBlock, (2, 2, 2, 2)),
    34: (ResidualBlock, (3, 4, 6, 3)),
    50: (ResidualBottleneck, (3, 4, 6, 3)),
    101: (ResidualBottleneck, (3, 4, 23, 3)),
}


def imagenet_resnet(cfg: QuantConfig, depth: int = 50,
                    weight_decay: float = 0.0, num_classes: int = 1000,
                    image_size: int = 224,
                    dropout_keep: float = 1.0) -> Model:
    """ImageNet ResNet-{18,34,50,101}: 7x7/2 stem, 3x3/2 maxpool, four
    stages at 64/128/256/512 channels.  The reference scoped ImageNet
    (its orphaned data.py:58-93) and ships the bottleneck block
    (dynamic_fixed_point.py:878-980) without ever instantiating it."""
    del dropout_keep  # ResNets use no dropout; accepted for CLI symmetry
    block_cls, stage_sizes = _IMAGENET_STAGES[depth]
    if getattr(cfg, "stem_s2d", False):
        # MLPerf space-to-depth stem (QuantConfig.stem_s2d): 2x2 s2d then
        # 4x4/s1 conv over 12 channels — same output as the 7x7/s2 Cin=3
        # conv (whose taps embed exactly, tests/test_layers.py) but with
        # MXU-fillable operands; the Cin=3 stem measured 72-126 GB/s in
        # the round-4 fusion audit.  Explicit (2,1) padding matches the
        # embedded 7x7 SAME window (SAME at k7/s2/224 pads (2,3); tap
        # offsets k-2 in [-2,4] embed to s2d taps [-1,2] -> pads (1,2)).
        stem = [
            SpaceToDepth(block=2),
            Conv2d("conv1", cfg, (4, 4, 12, 64), (1, 1),
                   ((1, 2), (1, 2)), use_bias=False,
                   weight_decay=weight_decay),
        ]
    else:
        stem = [
            Conv2d("conv1", cfg, (7, 7, 3, 64), (2, 2), "SAME",
                   use_bias=False, weight_decay=weight_decay),
        ]
    layers = stem + [
        BatchNorm("conv1-bn", cfg, 64, weight_decay=weight_decay),
        ReLU(),
        MaxPool(ksize=(3, 3), strides=(2, 2), padding="SAME"),
    ]
    cin = 64
    feat = image_size // 4
    for i, (channels, blocks) in enumerate(
            zip((64, 128, 256, 512), stage_sizes)):
        stride = 1 if i == 0 else 2
        stage, cin = _res_stage(
            cfg, f"stage{i + 1}", block_cls, cin, channels, blocks,
            stride, weight_decay,
        )
        layers += stage
        feat = -(-feat // stride)
    layers += [
        AvgPool(ksize=(feat, feat), strides=(1, 1), padding="VALID"),
        Flatten(),
        Dense("softmax", cfg, cin, num_classes,
              weight_decay=weight_decay),
    ]
    return Model(f"imagenet_resnet{depth}", layers,
                 input_shape=(image_size, image_size, 3),
                 num_classes=num_classes, cfg=cfg)


def vgg16(cfg: QuantConfig, dropout_keep: float = 0.5,
          weight_decay: float = 0.0, num_classes: int = 100,
          image_size: int = 32) -> Model:
    """Standard VGG-16 (conv config D) with BN, for CIFAR-100-class
    mixed-bit-width experiments (BASELINE.md config 3)."""
    plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
    layers = []
    cin = 3
    feat = image_size
    for stage, (c, reps) in enumerate(plan, start=1):
        for r in range(1, reps + 1):
            layers += [
                Conv2d(f"conv{stage}-{r}", cfg, (3, 3, cin, c), (1, 1),
                       "SAME", use_bias=False, weight_decay=weight_decay),
                BatchNorm(f"conv{stage}-{r}-bn", cfg, c,
                          weight_decay=weight_decay),
                ReLU(),
            ]
            cin = c
        layers.append(MaxPool(ksize=(2, 2), strides=(2, 2),
                              padding="VALID"))
        feat //= 2
    layers += [
        Flatten(),
        Dropout(keep=dropout_keep),
        Dense("dense1", cfg, 512 * feat * feat, 512,
              weight_decay=weight_decay),
        ReLU(),
        Dropout(keep=dropout_keep),
        Dense("softmax", cfg, 512, num_classes,
              weight_decay=weight_decay),
    ]
    return Model("vgg16", layers, input_shape=(image_size, image_size, 3),
                 num_classes=num_classes, cfg=cfg)


# ---------------------------------------------------------------------------
# registry (reference main.py:83-103's if/elif chain, as a dict)
# ---------------------------------------------------------------------------

MODEL_REGISTRY: Dict[str, Callable] = {
    "PI_MNIST": lambda cfg, **kw: pi_mnist_mlp(cfg, **kw),
    "MNIST": lambda cfg, **kw: lenet_mnist(cfg, **kw),
    "CIFAR10": lambda cfg, **kw: cifar10_convnet(cfg, **kw),
    "CIFAR10_VGG": lambda cfg, **kw: cifar10_vgg(cfg, **kw),
    "CIFAR10_Resnet20": lambda cfg, **kw: cifar10_resnet(cfg, 20, **kw),
    "CIFAR10_Resnet32": lambda cfg, **kw: cifar10_resnet(cfg, 32, **kw),
    "CIFAR10_Resnet44": lambda cfg, **kw: cifar10_resnet(cfg, 44, **kw),
    "CIFAR10_Resnet56": lambda cfg, **kw: cifar10_resnet(cfg, 56, **kw),
    "VGG16_CIFAR100": lambda cfg, **kw: vgg16(cfg, **kw),
    "Imagenet_Resnet18": lambda cfg, **kw: imagenet_resnet(cfg, 18, **kw),
    "Imagenet_Resnet50": lambda cfg, **kw: imagenet_resnet(cfg, 50, **kw),
}

# dataset each model trains on (reference main.py:83-103)
MODEL_DATASET: Dict[str, str] = {
    "PI_MNIST": "pi_mnist",
    "MNIST": "mnist",
    "CIFAR10": "cifar10",
    "CIFAR10_VGG": "cifar10",
    "CIFAR10_Resnet20": "cifar10",
    "CIFAR10_Resnet32": "cifar10",
    "CIFAR10_Resnet44": "cifar10",
    "CIFAR10_Resnet56": "cifar10",
    "VGG16_CIFAR100": "cifar100",
    "Imagenet_Resnet18": "imagenet",
    "Imagenet_Resnet50": "imagenet",
}


def build_model(name: str, cfg: QuantConfig, **kw) -> Model:
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](cfg, **kw)
