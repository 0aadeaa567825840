"""Functional quantized layer library."""

from lbt_tpu.nn.core import Ctx, Layer, Sequential, finalize  # noqa: F401
from lbt_tpu.nn.layers import (  # noqa: F401
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
from lbt_tpu.nn.norm import (  # noqa: F401
    BatchNorm, FusedBatchNorm, Normalization, Rescale)
from lbt_tpu.nn.blocks import ResidualBlock, ResidualBottleneck  # noqa: F401
from lbt_tpu.nn.model import Model  # noqa: F401
