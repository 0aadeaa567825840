"""Quantized batch normalization, split into statistics + affine halves
exactly as the reference does (Normalization_q / Rescale_q composed by a
Sequential, reference dynamic_fixed_point.py:539-743)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lbt_tpu.config import QuantConfig
from lbt_tpu.dfxp.barrier import grad_quant_barrier
from lbt_tpu.dfxp.quantize import quantize_ste
from lbt_tpu.nn.core import Layer, Sequential
from lbt_tpu.nn.layers import _site_init_exp

_SITE_X, _SITE_GAMMA, _SITE_BETA, _SITE_G = range(4)
_E0 = 0  # plain int: importing the package must not init the JAX backend

# checkpoint_name tags for the bn_residual_q16 policy (QuantConfig)
_XQ_NAME = "bn_xq"
_STATS_NAME = "bn_stats"


def _maybe_remat_apply(layer, impl, params, qstate, sinks, x, ctx):
    """Run ``impl`` under jax.checkpoint per cfg.remat_bn / bn_residual_q16.

    ``remat_bn``: full recompute — only the layer input is saved and the
    whole elementwise forward (quantize, moments, normalize) is replayed
    during backward (PRNG site keys are deterministic, so the replay
    draws identical rounding noise).  A *memory* knob: the replayed
    moment reductions measured slower than the residual traffic they
    save (benchmarks/BENCH_NOTES.md).

    ``bn_residual_q16``: selective save — a save_only_these_names policy
    keeps the post-quantizer input (stored bf16, exact on <=9-bit grids)
    and the batch moments; backward replays only the elementwise
    normalize/affine from those.  No moment reductions and no quantize
    re-run in the replay, while the saved residual shrinks from the f32
    normalize chain to one bf16 tensor — a *speed* knob for
    HBM-bandwidth-bound steps.

    Only active in training (eval has no backward).  See
    QuantConfig.remat_bn for the fused-BN rsqrt-rewrite caveat shared by
    any remat annotation.
    """
    import dataclasses as _dc
    cfg = layer.cfg
    if not ((cfg.remat_bn or cfg.bn_residual_q16) and ctx.train):
        return impl(params, qstate, sinks, x, ctx)

    def fn(p, q, s, x_, key):
        return impl(p, q, s, x_, _dc.replace(ctx, key=key))

    # Precedence (documented in QuantConfig.bn_residual_q16): when BOTH
    # remat knobs are set, full remat_bn wins and the q16 save policy is
    # ignored — full recompute already saves strictly less than the
    # selective policy would.
    if cfg.bn_residual_q16 and not cfg.remat_bn:
        fn = jax.checkpoint(
            fn, policy=jax.checkpoint_policies.save_only_these_names(
                _XQ_NAME, _STATS_NAME))
    else:
        fn = jax.checkpoint(fn)
    return fn(params, qstate, sinks, x, ctx.key)


def _tag_xq(cfg, xq, bits):
    """Tag the quantized BN input for the bn_residual_q16 save policy.

    Cast to bf16 for storage when the grid is exact there (<=9 bits);
    downstream math always reads the f32 upcast, so the forward VALUE is
    unchanged.  Note the backward direction: autodiff of the astype pair
    rounds the cotangent flowing to the BN input through bf16 as well
    (even with act_dtype='f32') — a ~2^-8-relative perturbation on a
    tensor the next upstream barrier requantizes to bits_g anyway, but a
    real divergence from the f32-cotangent path; it is part of what the
    bn_residual_q16 equivalence tests' tolerance covers
    (tests/test_carrier.py).  No-op (identity) when the knob is off.
    """
    from jax.ad_checkpoint import checkpoint_name
    if not cfg.bn_residual_q16:
        return xq
    if bits <= 9:
        xq = xq.astype(jnp.bfloat16)
    return checkpoint_name(xq, _XQ_NAME).astype(jnp.float32)


def _tag_stats(cfg, mean, var):
    """Tag batch moments as saved residuals for bn_residual_q16."""
    from jax.ad_checkpoint import checkpoint_name
    if not cfg.bn_residual_q16:
        return mean, var
    return (checkpoint_name(mean, _STATS_NAME),
            checkpoint_name(var, _STATS_NAME))


class Normalization(Layer):
    """BN statistics half (reference dynamic_fixed_point.py:539-623).

    Quantizes the input, takes batch moments of the *quantized* input over
    all axes but the channel axis, and normalizes; running statistics are
    EMA-updated (momentum 0.999) during training.  The mean/variance
    themselves stay unquantized (reference TODO at :615).  Gradients flow
    through the batch moments, as in the reference's
    ``tf.gradients(y, X, gradq)``.

    Eval uses running statistics; ``cfg.faithful_eval`` reproduces the
    reference bug of evaluating with batch statistics (reference
    trainer.py:164-165).
    """

    def __init__(self, name: str, cfg: QuantConfig, num_features: int,
                 momentum: float = None, eps: float = 1e-5):
        super().__init__(name, cfg)
        self.num_features = num_features
        self.momentum = cfg.bn_momentum if momentum is None else momentum
        self.eps = eps

    def init(self, key):
        cfg = self.cfg
        exp = {}
        if cfg.bits_a < 32:
            exp["x"] = jnp.int32(cfg.initial_exponent)
        if cfg.bits_g < 32:
            exp["grad"] = jnp.int32(_site_init_exp(cfg, "grad"))
        state = {
            "mean": jnp.zeros((self.num_features,), jnp.float32),
            "var": jnp.ones((self.num_features,), jnp.float32),
        }
        return {}, {"exp": exp, "state": state}

    def sink_spec(self):
        return {"grad": (2,)} if self.cfg.bits_g < 32 else {}

    def apply(self, params, qstate, sinks, x, ctx):
        return _maybe_remat_apply(
            self, self._apply_impl, params, qstate, sinks, x, ctx)

    def _apply_impl(self, params, qstate, sinks, x, ctx):
        cfg = self.cfg
        # carrier boundary: internal math at f32, output at cfg.act_dtype
        x = x.astype(jnp.float32)
        exp = qstate["exp"]
        state = qstate["state"]
        new_exp = dict(exp)
        # no PRNG key (serving) -> deterministic round-to-nearest
        kw = dict(stochastic=cfg.stochastic and ctx.key is not None,
                  noise_shared_axis0=cfg.noise_shared_axis0,
                  noise_bits=cfg.resolved_noise_bits,
                  backend=cfg.quant_backend)

        if "x" in exp:
            new_exp["x"] = self._ctrl(ctx, x, cfg.bits_a, exp["x"])
        xq = quantize_ste(
            x, cfg.bits_a, exp.get("x", _E0),
            ctx.layer_key(self.uid, _SITE_X), **kw,
        )
        xq = _tag_xq(cfg, xq, cfg.bits_a)

        axes = tuple(range(x.ndim - 1))

        def batch_moments():
            # cross-shard (sync-BN) moments when data-parallel, so the
            # normalization and EMA state match global-batch semantics
            mean = jnp.mean(xq, axes)
            m2 = jnp.mean(jnp.square(xq), axes)
            if ctx.psum_axis is not None:
                mean = jax.lax.pmean(mean, ctx.psum_axis)
                m2 = jax.lax.pmean(m2, ctx.psum_axis)
            return _tag_stats(cfg, mean, m2 - jnp.square(mean))

        if ctx.train:
            mean, var = batch_moments()
        else:
            mean, var = state["mean"], state["var"]

        if ctx.update:
            m = self.momentum
            mean_b, var_b = (mean, var) if ctx.train else batch_moments()
            new_state = {
                "mean": m * state["mean"] + (1 - m) * mean_b,
                "var": m * state["var"] + (1 - m) * var_b,
            }
        else:
            new_state = state

        y = (xq - mean) / jnp.sqrt(var + self.eps)

        if cfg.bits_g < 32:
            y = grad_quant_barrier(
                y, cfg.bits_g, exp["grad"], sinks["grad"],
                ctx.layer_key(self.uid, _SITE_G),
                target_overflow_rate=cfg.target_overflow_rate,
                gate=ctx.update_gate, **kw,
            )
        y = y.astype(cfg.carrier_dtype)
        return y, {"exp": new_exp, "state": new_state}

    def absorb_sinks(self, qstate, sink_cots):
        return self._absorb_grad_site(qstate, sink_cots, self.cfg.bits_g)

    def info(self):
        return f"normalization C={self.num_features}"


class Rescale(Layer):
    """BN affine half: ``y = Xq * gamma_q + beta_q`` with gamma, beta and
    the input each DFXP-quantized (reference dynamic_fixed_point.py:626-694).
    Weight decay applies to gamma but not beta (reference :689-690)."""

    def __init__(self, name: str, cfg: QuantConfig, num_features: int,
                 weight_decay: float = 0.0):
        super().__init__(name, cfg)
        self.num_features = num_features
        self.weight_decay = weight_decay

    def init(self, key):
        cfg = self.cfg
        params = {
            "gamma": jnp.ones((self.num_features,), jnp.float32),
            "beta": jnp.zeros((self.num_features,), jnp.float32),
        }
        exp = {}
        if cfg.bits_a < 32:
            exp["x"] = jnp.int32(cfg.initial_exponent)
        if cfg.bits_b < 32:
            exp["gamma"] = jnp.int32(cfg.initial_exponent)
            exp["beta"] = jnp.int32(cfg.initial_exponent)
        if cfg.bits_g < 32:
            exp["grad"] = jnp.int32(_site_init_exp(cfg, "grad"))
        return params, {"exp": exp, "state": {}}

    def sink_spec(self):
        return {"grad": (2,)} if self.cfg.bits_g < 32 else {}

    def decay_tree(self):
        return {"gamma": self.weight_decay, "beta": 0.0}

    def apply(self, params, qstate, sinks, x, ctx):
        return _maybe_remat_apply(
            self, self._apply_impl, params, qstate, sinks, x, ctx)

    def _apply_impl(self, params, qstate, sinks, x, ctx):
        cfg = self.cfg
        # carrier boundary: internal math at f32, output at cfg.act_dtype
        x = x.astype(jnp.float32)
        exp = qstate["exp"]
        new_exp = dict(exp)
        # no PRNG key (serving) -> deterministic round-to-nearest
        kw = dict(stochastic=cfg.stochastic and ctx.key is not None,
                  noise_shared_axis0=cfg.noise_shared_axis0,
                  noise_bits=cfg.resolved_noise_bits,
                  backend=cfg.quant_backend)

        if "x" in exp:
            new_exp["x"] = self._ctrl(ctx, x, cfg.bits_a, exp["x"])
        if "gamma" in exp:
            new_exp["gamma"] = self._ctrl(
                ctx, params["gamma"], cfg.bits_b, exp["gamma"])
            new_exp["beta"] = self._ctrl(
                ctx, params["beta"], cfg.bits_b, exp["beta"])

        xq = quantize_ste(
            x, cfg.bits_a, exp.get("x", _E0),
            ctx.layer_key(self.uid, _SITE_X), **kw,
        )
        xq = _tag_xq(cfg, xq, cfg.bits_a)
        gq = quantize_ste(
            params["gamma"], cfg.bits_b, exp.get("gamma", _E0),
            ctx.layer_key(self.uid, _SITE_GAMMA), **kw,
        )
        bq = quantize_ste(
            params["beta"], cfg.bits_b, exp.get("beta", _E0),
            ctx.layer_key(self.uid, _SITE_BETA), **kw,
        )
        y = xq * gq + bq

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
        return f"rescale C={self.num_features} wd {self.weight_decay}"


class FusedBatchNorm(Layer):
    """Lean single-pass BN: quantize the input ONCE, normalize with batch
    (or running) moments, apply the quantized affine, and place ONE
    cotangent-quantization barrier at the output.

    The reference pipeline (Normalization_q -> Rescale_q, reference
    dynamic_fixed_point.py:539-743) quantizes the full activation twice
    on the forward pass and the cotangent twice on the backward pass;
    this fused form halves that noise/controller work.  Opt in via
    ``QuantConfig(fused_bn=True)`` — a documented divergence from
    reference semantics (accuracy parity validated in tests /
    benchmarks/accuracy.py).
    """

    def __init__(self, name: str, cfg: QuantConfig, num_features: int,
                 momentum: float = None, eps: float = 1e-5,
                 weight_decay: float = 0.0):
        super().__init__(name, cfg)
        self.num_features = num_features
        self.momentum = cfg.bn_momentum if momentum is None else momentum
        self.eps = eps
        self.weight_decay = weight_decay

    def init(self, key):
        cfg = self.cfg
        params = {
            "gamma": jnp.ones((self.num_features,), jnp.float32),
            "beta": jnp.zeros((self.num_features,), jnp.float32),
        }
        exp = {}
        if cfg.bits_a < 32:
            exp["x"] = jnp.int32(cfg.initial_exponent)
        if cfg.bits_b < 32:
            exp["gamma"] = jnp.int32(cfg.initial_exponent)
            exp["beta"] = jnp.int32(cfg.initial_exponent)
        if cfg.bits_g < 32:
            exp["grad"] = jnp.int32(_site_init_exp(cfg, "grad"))
        state = {
            "mean": jnp.zeros((self.num_features,), jnp.float32),
            "var": jnp.ones((self.num_features,), jnp.float32),
        }
        return params, {"exp": exp, "state": state}

    def sink_spec(self):
        return {"grad": (2,)} if self.cfg.bits_g < 32 else {}

    def decay_tree(self):
        return {"gamma": self.weight_decay, "beta": 0.0}

    def apply(self, params, qstate, sinks, x, ctx):
        return _maybe_remat_apply(
            self, self._apply_impl, params, qstate, sinks, x, ctx)

    def _apply_impl(self, params, qstate, sinks, x, ctx):
        cfg = self.cfg
        # carrier boundary: internal math at f32, output at cfg.act_dtype
        x = x.astype(jnp.float32)
        exp = qstate["exp"]
        state = qstate["state"]
        new_exp = dict(exp)
        kw = dict(stochastic=cfg.stochastic and ctx.key is not None,
                  noise_shared_axis0=cfg.noise_shared_axis0,
                  noise_bits=cfg.resolved_noise_bits,
                  backend=cfg.quant_backend)

        if "x" in exp:
            new_exp["x"] = self._ctrl(ctx, x, cfg.bits_a, exp["x"])
        if "gamma" in exp:
            new_exp["gamma"] = self._ctrl(
                ctx, params["gamma"], cfg.bits_b, exp["gamma"])
            new_exp["beta"] = self._ctrl(
                ctx, params["beta"], cfg.bits_b, exp["beta"])

        xq = quantize_ste(
            x, cfg.bits_a, exp.get("x", _E0),
            ctx.layer_key(self.uid, _SITE_X), **kw,
        )
        xq = _tag_xq(cfg, xq, cfg.bits_a)
        gq = quantize_ste(
            params["gamma"], cfg.bits_b, exp.get("gamma", _E0),
            ctx.layer_key(self.uid, _SITE_GAMMA), **kw,
        )
        bq = quantize_ste(
            params["beta"], cfg.bits_b, exp.get("beta", _E0),
            ctx.layer_key(self.uid, _SITE_BETA), **kw,
        )

        axes = tuple(range(x.ndim - 1))

        def batch_moments():
            mean = jnp.mean(xq, axes)
            m2 = jnp.mean(jnp.square(xq), axes)
            if ctx.psum_axis is not None:
                mean = jax.lax.pmean(mean, ctx.psum_axis)
                m2 = jax.lax.pmean(m2, ctx.psum_axis)
            return _tag_stats(cfg, mean, m2 - jnp.square(mean))

        if ctx.train:
            mean, var = batch_moments()
        else:
            mean, var = state["mean"], state["var"]

        if ctx.update:
            m = self.momentum
            mean_b, var_b = (mean, var) if ctx.train else batch_moments()
            new_state = {
                "mean": m * state["mean"] + (1 - m) * mean_b,
                "var": m * state["var"] + (1 - m) * var_b,
            }
        else:
            new_state = state

        y = (xq - mean) * (gq / jnp.sqrt(var + self.eps)) + bq

        if cfg.bits_g < 32:
            y = grad_quant_barrier(
                y, cfg.bits_g, exp["grad"], sinks["grad"],
                ctx.layer_key(self.uid, _SITE_G),
                target_overflow_rate=cfg.target_overflow_rate,
                gate=ctx.update_gate, **kw,
            )
        y = y.astype(cfg.carrier_dtype)
        return y, {"exp": new_exp, "state": new_state}

    def absorb_sinks(self, qstate, sink_cots):
        return self._absorb_grad_site(qstate, sink_cots, self.cfg.bits_g)

    def info(self):
        return (f"fused-batchnorm C={self.num_features} "
                f"wd {self.weight_decay}")


class BatchNorm(Sequential):
    """Normalization + Rescale (reference BatchNorm_q,
    dynamic_fixed_point.py:697-743); ``cfg.fused_bn`` swaps in the lean
    single-quantization :class:`FusedBatchNorm`."""

    def __init__(self, name: str, cfg: QuantConfig, num_features: int,
                 momentum: float = None, eps: float = 1e-5,
                 weight_decay: float = 0.0):
        if cfg.fused_bn:
            layers = [FusedBatchNorm(
                "fused", cfg, num_features, momentum, eps, weight_decay)]
        else:
            layers = [
                Normalization("norm", cfg, num_features, momentum, eps),
                Rescale("rescale", cfg, num_features, weight_decay),
            ]
        super().__init__(name, layers)

    def info(self):
        return "batchnorm"
