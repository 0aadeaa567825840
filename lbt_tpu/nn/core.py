"""Layer protocol and containers.

The reference's ``Layer_q`` protocol (reference dynamic_fixed_point.py:97-126)
is object-oriented and stateful: layers cache tensors on ``self`` during
graph construction and mutate TF variables through collections.  Here a
layer is a *pure description*; all state lives in three parallel pytrees
threaded through ``apply``:

* ``params``  — trainable leaves (differentiated);
* ``qstate``  — per-layer ``{'exp': {site: int32 exponent}, 'state': {...}}``
  (quantizer exponents, BN running stats, error-feedback buffers);
* ``sinks``   — per-layer zero arrays whose loss-cotangents carry
  backward-pass information out of ``jax.grad`` (overflow stats of
  quantized cotangents, updated error-feedback buffers).

``apply(params, qstate, sinks, x, ctx) -> (y, new_qstate)`` returns
functionally-updated state; the exponent controllers for forward sites run
inline (training only).  Backward-site updates are applied after the
gradient computation via ``absorb_sinks`` (see train/step.py).

Containers nest the trees by unique child name.  The names ``exp``,
``state``, ``grad`` and ``buffer`` are reserved.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lbt_tpu.config import QuantConfig
from lbt_tpu.dfxp.quantize import overflow_stats, update_exponent

_RESERVED = {"exp", "state", "grad", "buffer"}

Vars = Dict[str, Any]


@dataclasses.dataclass
class Ctx:
    """Per-call context.  ``train`` and ``update`` are static under jit;
    ``key`` is the per-step PRNG key (layers fold in their uid and a
    site index).

    ``train`` selects *behavior* (dropout on, BN batch statistics);
    ``update`` selects *state mutation* (exponent controllers, BN EMA).
    A normal train step uses (True, True), normal eval (False, False),
    and ``faithful_eval`` — the reference's eval-with-training=True bug,
    reference trainer.py:164-165 — uses (True, False).

    ``psum_axis``: mesh axis name when running data-parallel under
    shard_map.  Overflow rates and BN batch moments are pmean-synchronized
    across it so that quantizer exponents and running statistics stay
    replicated (the global-batch semantics of the reference, scaled).

    ``update_gate``: STATIC bool gating the range controllers
    (``QuantConfig.range_update_every``): False elides every overflow
    reduction from the compiled program and holds all exponents (the
    barrier sinks emit a hold sentinel).  The per-step choice between
    the gated-on and gated-off variants is a single ``lax.cond`` around
    the whole train step (train/step.py) — per-site runtime conds
    measured slower than the reductions they skip.  BN EMA and the
    error-feedback buffers are NOT gated (they are state the reference
    updates every step)."""

    train: bool
    key: Optional[jax.Array] = None
    update: Optional[bool] = None
    psum_axis: Optional[str] = None
    update_gate: bool = True

    def __post_init__(self):
        if self.update is None:
            self.update = self.train

    def layer_key(self, uid: int, site: int) -> Optional[jax.Array]:
        if self.key is None:
            return None
        return jax.random.fold_in(jax.random.fold_in(self.key, uid), site)


class Layer:
    """Base layer: identity with no state."""

    def __init__(self, name: str = "", cfg: Optional[QuantConfig] = None):
        assert name not in _RESERVED, f"layer name {name!r} is reserved"
        self.name = name
        self.cfg = cfg
        self.uid = -1  # assigned by finalize()

    # -- structure ---------------------------------------------------------
    def init(self, key: jax.Array) -> Tuple[Vars, Vars]:
        """Returns (params, qstate) for this layer."""
        return {}, {}

    def sink_spec(self) -> Dict[str, Tuple[int, ...]]:
        """site name -> shape of the zero sink differentiated at the top."""
        return {}

    def decay_tree(self) -> Vars:
        """Weight-decay coefficient per params leaf (same structure)."""
        return {}

    # -- compute -----------------------------------------------------------
    def apply(self, params: Vars, qstate: Vars, sinks: Vars, x: jax.Array,
              ctx: Ctx) -> Tuple[jax.Array, Vars]:
        return x, qstate

    def absorb_sinks(self, qstate: Vars, sink_cots: Vars) -> Vars:
        """Fold backward-pass sink cotangents into qstate (controller steps
        for gradient exponents, error-feedback buffer updates)."""
        return qstate

    # -- misc --------------------------------------------------------------
    def info(self) -> str:
        return self.__class__.__name__

    def children(self) -> Sequence["Layer"]:
        return ()

    # helper for quantized leaf layers -------------------------------------
    def _ctrl(self, ctx: Ctx, x: jax.Array, bits: int,
              exp: jax.Array) -> jax.Array:
        """Forward-site controller step (measured on the pre-quant tensor
        at the current exponent; reference dynamic_fixed_point.py:40-41,
        :70-94).  No-op outside training."""
        if not ctx.update or not ctx.update_gate or bits >= 32:
            return exp
        target = self.cfg.target_overflow_rate
        rates = overflow_stats(x, bits, exp, target)
        if ctx.psum_axis is not None:
            rates = jax.lax.pmean(rates, ctx.psum_axis)
        return update_exponent(exp, rates, bits, target)

    def _absorb_grad_site(self, qstate: Vars, sink_cots: Vars,
                          bits_g: int) -> Vars:
        if "grad" not in sink_cots:
            return qstate
        new_exp = dict(qstate["exp"])
        new_exp["grad"] = update_exponent(
            qstate["exp"]["grad"], sink_cots["grad"], bits_g,
            self.cfg.target_overflow_rate,
        )
        out = dict(qstate)
        out["exp"] = new_exp
        return out


def finalize(root: "Layer") -> "Layer":
    """Assign deterministic uids (DFS order) and check name uniqueness."""
    counter = [0]

    def visit(layer: Layer):
        layer.uid = counter[0]
        counter[0] += 1
        names = set()
        for child in layer.children():
            assert child.name not in names, \
                f"duplicate child name {child.name!r} under {layer.name!r}"
            names.add(child.name)
            visit(child)

    visit(root)
    return root


def auto_name(layers: Sequence[Layer]) -> List[Layer]:
    """Give unnamed layers positional names."""
    out = []
    for i, layer in enumerate(layers):
        if not layer.name:
            layer.name = f"{i:02d}_{layer.__class__.__name__.lower()}"
        out.append(layer)
    return out


class Sequential(Layer):
    """Chain of layers (reference Sequential_q,
    dynamic_fixed_point.py:512-536); trees nest by child name."""

    def __init__(self, name: str, layers: Sequence[Layer]):
        super().__init__(name)
        self.layers = auto_name(list(layers))

    def children(self) -> Sequence[Layer]:
        return self.layers

    def init(self, key):
        params, qstate = {}, {}
        for layer in self.layers:
            sub = jax.random.fold_in(key, layer.uid)
            p, q = layer.init(sub)
            params[layer.name] = p
            qstate[layer.name] = q
        return params, qstate

    def sink_spec(self):
        spec = {}
        for layer in self.layers:
            s = layer.sink_spec()
            if s:
                spec[layer.name] = s
        return spec

    def decay_tree(self):
        return {
            layer.name: layer.decay_tree() for layer in self.layers
        }

    def apply(self, params, qstate, sinks, x, ctx):
        new_qstate = {}
        for layer in self.layers:
            x, q = layer.apply(
                params[layer.name], qstate[layer.name],
                sinks.get(layer.name, {}), x, ctx,
            )
            new_qstate[layer.name] = q
        return x, new_qstate

    def absorb_sinks(self, qstate, sink_cots):
        out = dict(qstate)
        for layer in self.layers:
            if layer.name in sink_cots:
                out[layer.name] = layer.absorb_sinks(
                    qstate[layer.name], sink_cots[layer.name]
                )
        return out

    def info(self):
        return "\n\t".join(
            ["Sequential:"] + [layer.info() for layer in self.layers]
        )


def make_sinks(root: Layer) -> Vars:
    """Zero sinks matching ``root.sink_spec()``."""

    def build(spec):
        return {
            k: (jnp.zeros(v, jnp.float32) if isinstance(v, tuple)
                else build(v))
            for k, v in spec.items()
        }

    return build(root.sink_spec())
