"""Quantized leaf layers.

Semantics mirror the reference layer classes (file:line cited per class)
but are expressed functionally; integer compute is delegated to
lbt_tpu.ops.qops.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes, lax

from lbt_tpu.config import QuantConfig
from lbt_tpu.dfxp.barrier import grad_quant_barrier
from lbt_tpu.dfxp.quantize import (
    multiplier,
    overflow_stats,
    quantize,
    quantize_ste,
    wrap_key,
)
from lbt_tpu.nn.core import Ctx, Layer
from lbt_tpu.ops.qops import qconv2d, qmatmul

# PRNG site indices (folded into the layer key)
_SITE_X, _SITE_W, _SITE_B, _SITE_G, _SITE_DROP = range(5)

_E0 = 0  # dummy exponent for absent sites (plain int: no backend init at import)


def _init_exps(cfg: QuantConfig, sites) -> dict:
    """int32 exponent per active (< 32-bit) site; init reference default 2
    (reference dynamic_fixed_point.py:131,256-266).  Gradient sites may
    cold-start lower (QuantConfig.initial_exponent_g — the walk-down
    noise-injection fix; see config.py)."""
    return {
        name: jnp.int32(_site_init_exp(cfg, name))
        for name, bits in sites if bits < 32
    }


def _site_init_exp(cfg: QuantConfig, site: str) -> int:
    if site == "grad" and cfg.initial_exponent_g is not None:
        return cfg.initial_exponent_g
    return cfg.initial_exponent


class Dense(Layer):
    """Quantized fully-connected layer (reference
    dynamic_fixed_point.py:319-470).  X and W both at ``bits_a``/``bits_w``
    (dense activations do NOT get the conv +1 bit, reference :384-388);
    forward ``y = Xq @ Wq + bq``; backward quantizes the output cotangent
    once and reuses it for dW, db and dX (reference :441-460)."""

    def __init__(self, name: str, cfg: QuantConfig, in_units: int,
                 units: int, use_bias: bool = True,
                 weight_decay: float = 0.0):
        super().__init__(name, cfg)
        self.in_units = in_units
        self.units = units
        self.use_bias = use_bias
        self.weight_decay = weight_decay

    def init(self, key):
        cfg = self.cfg
        limit = (6.0 / (self.in_units + self.units)) ** 0.5  # ref :338
        params = {
            "W": jax.random.uniform(
                key, (self.in_units, self.units), jnp.float32,
                -limit, limit,
            )
        }
        sites = [("x", cfg.bits_a), ("w", cfg.bits_w), ("grad", cfg.bits_g)]
        if self.use_bias:
            params["b"] = jnp.zeros((self.units,), jnp.float32)
            sites.append(("b", cfg.bits_b))
        return params, {"exp": _init_exps(cfg, sites), "state": {}}

    def sink_spec(self):
        return {"grad": (2,)} if self.cfg.bits_g < 32 else {}

    def decay_tree(self):
        d = {"W": self.weight_decay}
        if self.use_bias:
            d["b"] = 0.0
        return d

    def apply(self, params, qstate, sinks, x, ctx):
        cfg = self.cfg
        # carrier boundary: internal math at f32, output at cfg.act_dtype
        # (exact no-op when act_dtype == 'f32')
        x = x.astype(jnp.float32)
        exp = qstate["exp"]
        new_exp = dict(exp)
        if "x" in exp:
            new_exp["x"] = self._ctrl(ctx, x, cfg.bits_a, exp["x"])
        if "w" in exp:
            new_exp["w"] = self._ctrl(ctx, params["W"], cfg.bits_w, exp["w"])

        # no PRNG key (serving) -> deterministic round-to-nearest
        kw = dict(stochastic=cfg.stochastic and ctx.key is not None,
                  noise_shared_axis0=cfg.noise_shared_axis0,
                  noise_bits=cfg.resolved_noise_bits,
                  backend=cfg.quant_backend)
        y = qmatmul(
            x, params["W"],
            exp.get("x", _E0), exp.get("w", _E0), exp.get("grad", _E0),
            bits_x=cfg.bits_a, bits_w=cfg.bits_w, bits_g=cfg.bits_g,
            engine=cfg.engine,
            key_x=ctx.layer_key(self.uid, _SITE_X),
            key_w=ctx.layer_key(self.uid, _SITE_W),
            **kw,
        )
        if self.use_bias:
            b = params["b"]
            if "b" in exp:
                new_exp["b"] = self._ctrl(ctx, b, cfg.bits_b, exp["b"])
            y = y + quantize_ste(
                b, cfg.bits_b, exp.get("b", _E0),
                ctx.layer_key(self.uid, _SITE_B), **kw,
            )
        if cfg.bits_g < 32:
            y = grad_quant_barrier(
                y, cfg.bits_g, exp["grad"], sinks["grad"],
                ctx.layer_key(self.uid, _SITE_G),
                target_overflow_rate=cfg.target_overflow_rate,
                gate=ctx.update_gate, **kw,
            )
        y = y.astype(cfg.carrier_dtype)
        return y, {"exp": new_exp, "state": qstate["state"]}

    def absorb_sinks(self, qstate, sink_cots):
        return self._absorb_grad_site(qstate, sink_cots, self.cfg.bits_g)

    def info(self):
        return (f"dense {self.in_units}x{self.units} "
                f"w{self.cfg.bits_w}a{self.cfg.bits_a}g{self.cfg.bits_g} "
                f"wd {self.weight_decay}")


class Conv2d(Layer):
    """Quantized 2-d convolution, NHWC (reference
    dynamic_fixed_point.py:224-316; Conv2d_pq at :129-221 is a verbatim
    duplicate and maps to this same class).  Activations are quantized at
    ``bits_a + 1`` (reference :287-288), weights at ``bits_w``."""

    def __init__(self, name: str, cfg: QuantConfig,
                 ksize: Tuple[int, int, int, int],
                 strides: Tuple[int, int] = (1, 1), padding="SAME",
                 use_bias: bool = True, weight_decay: float = 0.0):
        super().__init__(name, cfg)
        self.ksize = tuple(ksize)  # (kh, kw, Cin, Cout)
        self.strides = tuple(strides)
        self.padding = padding
        self.use_bias = use_bias
        self.weight_decay = weight_decay

    def init(self, key):
        cfg = self.cfg
        kh, kw_, cin, cout = self.ksize
        fan_in = kh * kw_ * cin
        limit = (3.0 / fan_in) ** 0.5  # ref :248
        params = {
            "W": jax.random.uniform(
                key, self.ksize, jnp.float32, -limit, limit
            )
        }
        sites = [("x", cfg.bits_a_conv), ("w", cfg.bits_w),
                 ("grad", cfg.bits_g)]
        if self.use_bias:
            params["b"] = jnp.zeros((cout,), jnp.float32)
            sites.append(("b", cfg.bits_b))
        return params, {"exp": _init_exps(cfg, sites), "state": {}}

    def sink_spec(self):
        return {"grad": (2,)} if self.cfg.bits_g < 32 else {}

    def decay_tree(self):
        d = {"W": self.weight_decay}
        if self.use_bias:
            d["b"] = 0.0
        return d

    def apply(self, params, qstate, sinks, x, ctx):
        cfg = self.cfg
        # carrier boundary (see Dense.apply)
        x = x.astype(jnp.float32)
        bits_x = cfg.bits_a_conv
        exp = qstate["exp"]
        new_exp = dict(exp)
        if "x" in exp:
            new_exp["x"] = self._ctrl(ctx, x, bits_x, exp["x"])
        if "w" in exp:
            new_exp["w"] = self._ctrl(ctx, params["W"], cfg.bits_w, exp["w"])

        # no PRNG key (serving) -> deterministic round-to-nearest
        kw = dict(stochastic=cfg.stochastic and ctx.key is not None,
                  noise_shared_axis0=cfg.noise_shared_axis0,
                  noise_bits=cfg.resolved_noise_bits,
                  backend=cfg.quant_backend)
        y = qconv2d(
            x, params["W"],
            exp.get("x", _E0), exp.get("w", _E0), exp.get("grad", _E0),
            strides=self.strides, padding=self.padding,
            bits_x=bits_x, bits_w=cfg.bits_w, bits_g=cfg.bits_g,
            engine=cfg.engine, split9=cfg.conv9_split,
            key_x=ctx.layer_key(self.uid, _SITE_X),
            key_w=ctx.layer_key(self.uid, _SITE_W),
            **kw,
        )
        if self.use_bias:
            b = params["b"]
            if "b" in exp:
                new_exp["b"] = self._ctrl(ctx, b, cfg.bits_b, exp["b"])
            y = y + quantize_ste(
                b, cfg.bits_b, exp.get("b", _E0),
                ctx.layer_key(self.uid, _SITE_B), **kw,
            )
        if cfg.bits_g < 32:
            y = grad_quant_barrier(
                y, cfg.bits_g, exp["grad"], sinks["grad"],
                ctx.layer_key(self.uid, _SITE_G),
                target_overflow_rate=cfg.target_overflow_rate,
                gate=ctx.update_gate, **kw,
            )
        y = y.astype(cfg.carrier_dtype)
        return y, {"exp": new_exp, "state": qstate["state"]}

    def absorb_sinks(self, qstate, sink_cots):
        return self._absorb_grad_site(qstate, sink_cots, self.cfg.bits_g)

    def info(self):
        kh, kw_, _, cout = self.ksize
        return (f"conv2d {kh}x{kw_}x{cout} stride {self.strides} "
                f"pad {self.padding} "
                f"w{self.cfg.bits_w}a{self.cfg.bits_a_conv}"
                f"g{self.cfg.bits_g} wd {self.weight_decay}")


class ReLU(Layer):
    """max(0, x); cotangent flows through unquantized (reference
    dynamic_fixed_point.py:983-990 inherits the default backward).

    Implemented as ``where(x > 0, x, 0)`` rather than ``maximum``: the
    reference's ``tf.maximum(0.0, X)`` routes ZERO cotangent to inputs
    exactly at 0 (TF MaximumGrad first-arg-wins tie rule), whereas
    ``jnp.maximum`` splits ties 0.5/0.5 — and exact zeros are COMMON on
    quantized grids (e.g. BN rescale output is Xq*gq+bq with beta init
    0), so the tie rule is load-bearing for bitwise parity with the
    reference semantics (caught by the round-5 NumPy model oracle,
    tests/test_model_oracle.py)."""

    def apply(self, params, qstate, sinks, x, ctx):
        return jnp.where(x > 0, x, jnp.zeros((), x.dtype)), qstate

    def info(self):
        return "relu"


class MaxPool(Layer):
    """Max pooling (reference dynamic_fixed_point.py:993-1006)."""

    def __init__(self, name: str = "", *, ksize: Tuple[int, int],
                 strides: Tuple[int, int], padding: str = "VALID"):
        super().__init__(name)
        self.ksize = tuple(ksize)
        self.strides = tuple(strides)
        self.padding = padding.upper()

    def apply(self, params, qstate, sinks, x, ctx):
        y = lax.reduce_window(
            x, -jnp.inf, lax.max,
            (1,) + self.ksize + (1,), (1,) + self.strides + (1,),
            self.padding,
        )
        return y, qstate

    def info(self):
        return f"maxpool {self.ksize} stride {self.strides} {self.padding}"


class AvgPool(Layer):
    """Average pooling; padded positions are excluded from the mean
    (matches tf.nn.avg_pool; reference dynamic_fixed_point.py:1009-1022)."""

    def __init__(self, name: str = "", *, ksize: Tuple[int, int],
                 strides: Tuple[int, int], padding: str = "VALID"):
        super().__init__(name)
        self.ksize = tuple(ksize)
        self.strides = tuple(strides)
        self.padding = padding.upper()

    def apply(self, params, qstate, sinks, x, ctx):
        dims = (1,) + self.ksize + (1,)
        strides = (1,) + self.strides + (1,)
        # accumulate window sums at f32 (a bf16 carrier would otherwise
        # accumulate in bf16); output back at the carrier dtype
        total = lax.reduce_window(
            x.astype(jnp.float32), 0.0, lax.add, dims, strides, self.padding
        )
        if self.padding == "VALID":
            count = float(np.prod(self.ksize))
        else:
            ones = jnp.ones(x.shape[1:3], jnp.float32)[None, :, :, None]
            count = lax.reduce_window(
                ones, 0.0, lax.add, dims, strides, self.padding
            )
        return (total / count).astype(x.dtype), qstate

    def info(self):
        return f"avgpool {self.ksize} stride {self.strides} {self.padding}"


class Dropout(Layer):
    """Inverted dropout; ``keep`` is the keep-probability (the reference
    CLI's --dropout flag, reference dynamic_fixed_point.py:1025-1040,
    main.py:114).  Active only in training."""

    def __init__(self, name: str = "", *, keep: float = 0.5):
        super().__init__(name)
        self.keep = keep

    def apply(self, params, qstate, sinks, x, ctx):
        if not ctx.train or self.keep >= 1.0:
            return x, qstate
        key = ctx.layer_key(self.uid, _SITE_DROP)
        mask = jax.random.bernoulli(key, self.keep, x.shape)
        return jnp.where(mask, x / self.keep, 0.0), qstate

    def info(self):
        return f"dropout keep={self.keep}"


class Flatten(Layer):
    """Reshape to [N, dim] (reference dynamic_fixed_point.py:1043-1053)."""

    def __init__(self, name: str = "", *, dim: int = 0):
        super().__init__(name)
        self.dim = dim

    def apply(self, params, qstate, sinks, x, ctx):
        return x.reshape(x.shape[0], -1), qstate

    def info(self):
        return "flatten"


class SpaceToDepth(Layer):
    """NHWC block-rearrange: [B,H,W,C] -> [B,H/b,W/b,b*b*C], output
    channel order (ph, pw, c) phase-major.  Stateless, exact, autodiff
    through reshape/transpose.  Used by the s2d ImageNet stem
    (QuantConfig.stem_s2d): tap (oh, ow) of a stride-2 conv on the
    original image becomes tap (oh//2, ow//2) at phase channel
    (oh%2, ow%2) here, so a 7x7/s2 conv embeds exactly into a 4x4/s1
    conv on this layer's output (tests/test_layers.py)."""

    def __init__(self, name: str = "", *, block: int = 2):
        super().__init__(name)
        self.block = int(block)

    def apply(self, params, qstate, sinks, x, ctx):
        b = self.block
        n, h, w, c = x.shape
        assert h % b == 0 and w % b == 0, (x.shape, b)
        y = x.reshape(n, h // b, b, w // b, b, c)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, h // b, w // b, b * b * c), qstate

    def info(self):
        return f"space_to_depth block {self.block}"


# ---------------------------------------------------------------------------
# Error-feedback gradient buffer
# ---------------------------------------------------------------------------


def _float0(x) -> np.ndarray:
    aval = jax.api_util.shaped_abstractify(x)
    return np.zeros(aval.shape, dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7, 8, 9))
def _gradbuf(x, bits, exp, keydata, buffer, stochastic, shared, backend,
             target, run_stats, sink_stats, sink_buffer):
    del exp, keydata, buffer, sink_stats, sink_buffer
    return x


def _gradbuf_fwd(x, bits, exp, keydata, buffer, stochastic, shared, backend,
                 target, run_stats, sink_stats, sink_buffer):
    return x, (exp, keydata, buffer)


def _gradbuf_bwd(bits, stochastic, shared, backend, target, run_stats,
                 res, g):
    from lbt_tpu.dfxp.barrier import HOLD_STATS
    exp, keydata, buffer = res
    total = g + buffer
    if run_stats:
        stats = overflow_stats(total, bits, exp, target)
    else:
        stats = jnp.array(HOLD_STATS, jnp.float32)
    key = wrap_key(keydata) if stochastic else None
    gq = quantize(total, bits, exp, key,
                  stochastic=stochastic, noise_shared_axis0=shared,
                  backend=backend)
    new_buffer = total - gq
    # cotangent dtype must match the forward input's (bf16 carriers)
    return (gq.astype(g.dtype), _float0(exp), _float0(keydata),
            jnp.zeros_like(buffer), stats, new_buffer)


_gradbuf.defvjp(_gradbuf_fwd, _gradbuf_bwd)


class GradientBuffer(Layer):
    """Error-feedback gradient quantizer (reference GradientBuffer_q,
    dynamic_fixed_point.py:473-509): backward adds a persistent residual
    buffer to the incoming cotangent, quantizes the sum, and stores the
    quantization error back into the buffer.  Forward is the identity.

    The reference updates the buffer through a TF assign in UPDATE_OPS
    (reference :503-504); here the new buffer value rides out of the
    backward pass as the cotangent of a zero sink and is folded into
    ``qstate`` by ``absorb_sinks``.  Requires a static activation shape
    (the reference pads to one, :496-499); use drop-remainder batches.
    """

    def __init__(self, name: str, cfg: QuantConfig,
                 shape: Tuple[int, ...]):
        super().__init__(name, cfg)
        self.shape = tuple(shape)

    def init(self, key):
        cfg = self.cfg
        if cfg.bits_g >= 32:
            return {}, {"exp": {}, "state": {}}
        return {}, {
            "exp": {"grad": jnp.int32(_site_init_exp(cfg, "grad"))},
            "state": {"buffer": jnp.zeros(self.shape, jnp.float32)},
        }

    def sink_spec(self):
        if self.cfg.bits_g >= 32:
            return {}
        return {"grad": (2,), "buffer": self.shape}

    def apply(self, params, qstate, sinks, x, ctx):
        cfg = self.cfg
        if cfg.bits_g >= 32 or not ctx.train:
            # identity outside training: the buffer only participates in
            # the backward pass, and eval batches may have other shapes
            return x, qstate
        assert x.shape == self.shape, \
            f"GradientBuffer expects shape {self.shape}, got {x.shape}"
        key = ctx.layer_key(self.uid, _SITE_G)
        keydata = (jax.random.key_data(key) if key is not None
                   else np.zeros((2,), np.uint32))
        y = _gradbuf(
            x, cfg.bits_g, qstate["exp"]["grad"], keydata,
            qstate["state"]["buffer"], cfg.stochastic,
            cfg.noise_shared_axis0, cfg.quant_backend,
            cfg.target_overflow_rate, bool(ctx.update_gate),
            sinks["grad"], sinks["buffer"],
        )
        return y, qstate

    def absorb_sinks(self, qstate, sink_cots):
        out = self._absorb_grad_site(qstate, sink_cots, self.cfg.bits_g)
        if "buffer" in sink_cots:
            state = dict(out["state"])
            state["buffer"] = sink_cots["buffer"]
            out = dict(out)
            out["state"] = state
        return out

    def info(self):
        return f"gradient buffer {self.shape}"
