"""Model wrapper: a named layer stack + classification head utilities
(reference Model base class, models.py:7-54)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lbt_tpu.config import QuantConfig
from lbt_tpu.nn import core
from lbt_tpu.nn.core import Ctx, Layer, Sequential, finalize


class Model:
    """A quantized classifier.

    ``apply`` maps inputs to logits and returns the functionally-updated
    quantizer/BN state.  Loss is mean sparse softmax cross-entropy and
    accuracy is argmax top-1 (reference models.py:27-32).
    """

    def __init__(self, name: str, layers: Sequence[Layer],
                 input_shape: Tuple[int, ...], num_classes: int,
                 cfg: Optional[QuantConfig] = None):
        self.name = name
        self.net = finalize(Sequential(name, list(layers)))
        self.input_shape = tuple(input_shape)  # per-example, no batch dim
        self.num_classes = num_classes
        self.cfg = cfg

    # -- structure ---------------------------------------------------------
    def init(self, key: jax.Array):
        return self.net.init(key)

    def make_sinks(self):
        return core.make_sinks(self.net)

    def decay_tree(self):
        return self.net.decay_tree()

    def absorb_sinks(self, qstate, sink_cots):
        return self.net.absorb_sinks(qstate, sink_cots)

    # -- compute -----------------------------------------------------------
    def apply(self, params, qstate, sinks, x, ctx: Ctx):
        return self.net.apply(params, qstate, sinks, x, ctx)

    def loss_and_acc(self, logits: jax.Array, labels: jax.Array):
        """(mean softmax CE, top-1 accuracy)."""
        logits = logits.astype(jnp.float32)  # f32 head under bf16 carriers
        logz = jax.nn.logsumexp(logits, axis=-1)
        ll = jnp.take_along_axis(
            logits, labels[:, None].astype(jnp.int32), axis=-1
        )[:, 0]
        loss = jnp.mean(logz - ll)
        acc = jnp.mean(
            (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        )
        return loss, acc

    def info(self) -> str:
        return self.net.info()
