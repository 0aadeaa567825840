"""Residual blocks (reference dynamic_fixed_point.py:746-980).

Forward: ``relu(residual(x) + shortcut(x))``.  Backward needs no manual
chain: the per-layer ``grad_quant_barrier`` inside each conv/BN reproduces
the reference's quantize-the-cotangent semantics, and autodiff routes the
cotangent through the final ReLU and both branches and sums them
(reference :865-869).
"""

from __future__ import annotations

import jax.numpy as jnp

from lbt_tpu.config import QuantConfig
from lbt_tpu.nn.core import Layer, Sequential
from lbt_tpu.nn.layers import Conv2d, ReLU
from lbt_tpu.nn.norm import BatchNorm


def _conv_bn(name: str, cfg: QuantConfig, ksize, strides, batch_norm,
             weight_decay):
    layers = [
        Conv2d(name, cfg, ksize, strides, "SAME",
               use_bias=not batch_norm, weight_decay=weight_decay)
    ]
    if batch_norm:
        layers.append(
            BatchNorm(name + "-bn", cfg, ksize[3], weight_decay=weight_decay)
        )
    return layers


class ResidualBlock(Layer):
    """Basic 3x3+3x3 residual block, expansion 1 (reference
    ResidualBlock_q, dynamic_fixed_point.py:746-875)."""

    expansion = 1

    def __init__(self, name: str, cfg: QuantConfig, in_channels: int,
                 channels: int, stride: int = 1, batch_norm: bool = True,
                 weight_decay: float = 0.0):
        super().__init__(name, cfg)
        self.residual = Sequential(
            "residual", self._residual_layers(
                cfg, in_channels, channels, stride, batch_norm, weight_decay
            )
        )
        self.shortcut = Sequential(
            "shortcut", self._shortcut_layers(
                cfg, in_channels, channels, stride, batch_norm, weight_decay
            )
        )

    def _residual_layers(self, cfg, cin, c, stride, bn, wd):
        return (
            _conv_bn("conv1", cfg, (3, 3, cin, c), (stride, stride), bn, wd)
            + [ReLU("relu1")]
            + _conv_bn("conv2", cfg, (3, 3, c, c), (1, 1), bn, wd)
        )

    def _shortcut_layers(self, cfg, cin, c, stride, bn, wd):
        # identity when shape is preserved (reference :825-856)
        if stride == 1 and cin == self.expansion * c:
            return []
        return _conv_bn(
            "conv", cfg, (1, 1, cin, self.expansion * c),
            (stride, stride), bn, wd,
        )

    def children(self):
        return (self.residual, self.shortcut)

    def init(self, key):
        import jax
        pr, qr = self.residual.init(jax.random.fold_in(key, 0))
        ps, qs = self.shortcut.init(jax.random.fold_in(key, 1))
        return ({"residual": pr, "shortcut": ps},
                {"residual": qr, "shortcut": qs})

    def sink_spec(self):
        spec = {}
        for child in self.children():
            s = child.sink_spec()
            if s:
                spec[child.name] = s
        return spec

    def decay_tree(self):
        return {c.name: c.decay_tree() for c in self.children()}

    def apply(self, params, qstate, sinks, x, ctx):
        y1, q1 = self.residual.apply(
            params["residual"], qstate["residual"],
            sinks.get("residual", {}), x, ctx,
        )
        y2, q2 = self.shortcut.apply(
            params["shortcut"], qstate["shortcut"],
            sinks.get("shortcut", {}), x, ctx,
        )
        # where(s > 0, ...) not maximum: match the reference tf.maximum
        # tie rule (zero cotangent at exact 0 — see nn/layers.py ReLU)
        s = y1 + y2
        y = jnp.where(s > 0, s, jnp.zeros((), s.dtype))
        return y, {"residual": q1, "shortcut": q2}

    def absorb_sinks(self, qstate, sink_cots):
        out = dict(qstate)
        for child in self.children():
            if child.name in sink_cots:
                out[child.name] = child.absorb_sinks(
                    qstate[child.name], sink_cots[child.name]
                )
        return out

    def info(self):
        return "residual block: " + self.residual.info()


class ResidualBottleneck(ResidualBlock):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck, expansion 4 (reference
    ResidualBottleneck_q, dynamic_fixed_point.py:878-980)."""

    expansion = 4

    def _residual_layers(self, cfg, cin, c, stride, bn, wd):
        cout = self.expansion * c
        return (
            _conv_bn("conv1", cfg, (1, 1, cin, c), (1, 1), bn, wd)
            + [ReLU("relu1")]
            + _conv_bn("conv2", cfg, (3, 3, c, c), (stride, stride), bn, wd)
            + [ReLU("relu2")]
            + _conv_bn("conv3", cfg, (1, 1, c, cout), (1, 1), bn, wd)
        )

    def info(self):
        return "bottleneck block: " + self.residual.info()
