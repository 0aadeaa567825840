"""Quantized compute ops (XLA + Pallas)."""

from lbt_tpu.ops.qops import qconv2d, qmatmul, conv_same_padding  # noqa: F401
