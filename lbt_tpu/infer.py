"""Inference / deployment.

The reference has no inference path at all (training script only; its
checkpoint is save-only, reference trainer.py:189-192).  Here a trained
model deploys as:

* a jitted predict function (int8 forward on the MXU, running-stat BN,
  dropout off, deterministic quantization — the serving-grade config);
* an exported artifact of *integer weight codes* + exponents: weights
  ship as int8 (4x smaller than f32), or nibble-packed uint8 for <=4-bit
  schemes (8x smaller), plus one int32 exponent per tensor, and are
  bit-exactly reconstructible onto the DFXP grid.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lbt_tpu.dfxp.quantize import (EXP_MIN, dequantize, multiplier,
                                   quantize_int)
from lbt_tpu.nn.blocks import ResidualBlock
from lbt_tpu.nn.core import Ctx, Sequential
from lbt_tpu.nn.layers import Conv2d, Dense
from lbt_tpu.nn.model import Model
from lbt_tpu.nn.norm import BatchNorm, FusedBatchNorm, Normalization
from lbt_tpu.train import checkpoint as ckpt


def make_predict_fn(model: Model, return_probs: bool = False):
    """(params, qstate, x) -> labels [, probs].  Deterministic rounding
    (serving wants reproducible outputs), running BN statistics."""

    def predict(params, qstate, x):
        # no PRNG key in the ctx -> layers use deterministic
        # round-to-nearest regardless of cfg.stochastic
        sinks = model.make_sinks()
        logits, _ = model.apply(params, qstate, sinks, x,
                                Ctx(train=False, key=None, update=False))
        labels = jnp.argmax(logits, axis=-1)
        if return_probs:
            return labels, jax.nn.softmax(logits, axis=-1)
        return labels

    return jax.jit(predict)


# ---------------------------------------------------------------------------
# BatchNorm folding (serving-time graph transform)
# ---------------------------------------------------------------------------


def _fit_exponent(x, bits: int) -> jnp.ndarray:
    """Smallest DFXP exponent whose grid covers max|x| without clipping —
    the value the range controller (reference dynamic_fixed_point.py:70-94)
    would converge to for a static tensor at target overflow 0, with the
    same upper clamp ``exp <= bits-1`` (reference :94)."""
    maxabs = float(np.max(np.abs(np.asarray(x))))
    if maxabs == 0.0:
        return jnp.int32(0)
    limit = 2.0 ** (bits - 1) - 1  # codes clip at [-2^(b-1), 2^(b-1)-1]
    e = int(np.ceil(np.log2(maxabs / limit))) + bits - 1
    return jnp.int32(max(min(e, bits - 1), EXP_MIN))


def _bn_affine(bn: BatchNorm, p: Dict, q: Dict):
    """(scale, shift, running) of a BatchNorm wrapper at eval time:
    ``y = x * scale + shift`` with running statistics."""
    inner = bn.layers
    if len(inner) == 1 and isinstance(inner[0], FusedBatchNorm):
        fl = inner[0]
        stats = q[fl.name]["state"]
        aff = p[fl.name]
        eps = fl.eps
    else:
        norm, resc = inner
        assert isinstance(norm, Normalization)
        stats = q[norm.name]["state"]
        aff = p[resc.name]
        eps = norm.eps
    scale = aff["gamma"] / jnp.sqrt(stats["var"] + eps)
    shift = aff["beta"] - stats["mean"] * scale
    return scale, shift


def _fold_pair(lyr, p, q, bn: BatchNorm, pb, qb):
    """Fold ``bn`` (eval affine on running stats) into the preceding
    Conv2d/Dense: ``bn(W*x + b) == (W*scale)*x + (b*scale + shift)`` with
    scale broadcast over the output-channel (last W) axis.  Weight/bias
    exponents are refit to the folded tensors."""
    scale, shift = _bn_affine(bn, pb, qb)
    W = p["W"] * scale  # ksize (kh,kw,cin,cout) / (in,units): last axis
    b = shift + (p["b"] * scale if lyr.use_bias else 0.0)

    folded = copy.copy(lyr)
    folded.use_bias = True
    cfg = lyr.cfg
    exp = dict(q["exp"])
    if "w" in exp:
        exp["w"] = _fit_exponent(W, cfg.bits_w)
    if cfg.bits_b < 32:
        exp["b"] = _fit_exponent(b, cfg.bits_b)
    return folded, {"W": W, "b": b}, {"exp": exp,
                                      "state": dict(q.get("state", {}))}


def _fold_inplace(layer, p, q):
    """Recursively rewrite ``layer``'s subtree (a deep copy — safe to
    mutate), returning the matching rewritten (params, qstate)."""
    if isinstance(layer, Sequential):
        kids = layer.layers
        new_layers, new_p, new_q = [], {}, {}
        i = 0
        while i < len(kids):
            child = kids[i]
            nxt = kids[i + 1] if i + 1 < len(kids) else None
            if isinstance(child, (Conv2d, Dense)) and isinstance(
                    nxt, BatchNorm):
                fc, fp, fq = _fold_pair(
                    child, p[child.name], q[child.name],
                    nxt, p[nxt.name], q[nxt.name])
                new_layers.append(fc)
                new_p[fc.name] = fp
                new_q[fc.name] = fq
                i += 2
                continue
            cp, cq = _fold_inplace(
                child, p.get(child.name, {}), q.get(child.name, {}))
            new_layers.append(child)
            new_p[child.name] = cp
            new_q[child.name] = cq
            i += 1
        layer.layers = new_layers
        return new_p, new_q
    if isinstance(layer, ResidualBlock):  # incl. ResidualBottleneck
        pr, qr = _fold_inplace(layer.residual, p["residual"], q["residual"])
        ps, qs = _fold_inplace(layer.shortcut, p["shortcut"], q["shortcut"])
        return ({"residual": pr, "shortcut": ps},
                {"residual": qr, "shortcut": qs})
    return p, q


def fold_batchnorm(model: Model, params, qstate):
    """Serving-time BN folding: returns ``(model', params', qstate')``
    with every Conv2d/Dense + BatchNorm pair replaced by one biased
    conv/dense whose weights absorb the running-statistics affine
    (``W' = W * gamma/sqrt(var+eps)``, ``b' = beta - mean*gamma/sqrt(...)``),
    weight/bias exponents refit to the folded tensors.

    The folded model is a *deployment* artifact: the BN input-quantization
    site disappears (its rounding no longer perturbs the output) and eval
    runs one elementwise pass less per BN.  It must not be trained — the
    running statistics are frozen into the weights.  The reference has no
    deployment path at all (save-only checkpoints, reference
    trainer.py:189-192); standard practice supplied here.
    """
    net = copy.deepcopy(model.net)
    p, q = _fold_inplace(net, params, qstate)
    folded = Model(model.name, net.layers, model.input_shape,
                   model.num_classes, model.cfg)
    return folded, p, q


# ---------------------------------------------------------------------------
# quantized weight export
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class QuantizedLeaf:
    codes: jax.Array   # int8 (bits<=8) or int32; uint8 nibble-pairs when packed
    exp: jax.Array     # int32 scalar
    bits: int
    # bits <= 4: two offset-binary codes per byte (8x smaller than f32)
    packed: bool = False
    shape: Tuple[int, ...] = ()


def _pack4(codes: jax.Array) -> jax.Array:
    """int codes in [-2^(b-1), 2^(b-1)-1], b <= 4 -> uint8 nibble pairs
    (offset-binary, code + 8)."""
    flat = (codes.reshape(-1) + 8).astype(jnp.uint8)
    if flat.size % 2:
        flat = jnp.pad(flat, (0, 1))
    pair = flat.reshape(-1, 2)
    return pair[:, 0] | (pair[:, 1] << 4)


def _unpack4(packed: jax.Array, shape) -> jax.Array:
    lo = (packed & 0xF).astype(jnp.int32) - 8
    hi = (packed >> 4).astype(jnp.int32) - 8
    flat = jnp.stack([lo, hi], axis=1).reshape(-1)
    n = 1
    for d in shape:
        n *= d
    return flat[:n].reshape(shape)


def export_quantized_weights(model: Model, params, qstate) -> Dict:
    """Weights as integer codes on their *current* exponents.

    Walks params alongside qstate; any leaf with a matching exponent site
    ('W' -> 'w', 'b' -> 'b', 'gamma'/'beta' by name) exports as codes;
    leaves without a quantization site stay float.  Deterministic
    rounding (the deployed weights are the rounded grid points the
    forward pass would use)."""
    cfg = model.cfg
    site_of = {"W": "w", "b": "b", "gamma": "gamma", "beta": "beta"}
    bits_of = {"W": cfg.bits_w, "b": cfg.bits_b,
               "gamma": cfg.bits_b, "beta": cfg.bits_b}

    def walk(p, q):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = walk(v, q.get(k, {}))
            else:
                site = site_of.get(k)
                exps = q.get("exp", {}) if isinstance(q, dict) else {}
                if site is not None and site in exps:
                    bits = bits_of[k]
                    codes, _ = quantize_int(v, bits, exps[site])
                    if bits <= 4:
                        out[k] = QuantizedLeaf(
                            _pack4(codes), exps[site], bits,
                            packed=True, shape=tuple(v.shape))
                        continue
                    if bits <= 8:
                        codes = codes.astype(jnp.int8)
                    out[k] = QuantizedLeaf(codes, exps[site], bits)
                else:
                    out[k] = v
        return out

    return walk(params, qstate)


def restore_quantized_weights(exported) -> Dict:
    """Dequantize an exported tree back to float params (values lie
    exactly on the DFXP grid the forward pass quantizes to)."""

    def walk(node):
        if isinstance(node, QuantizedLeaf):
            codes = (_unpack4(node.codes, node.shape) if node.packed
                     else node.codes.astype(jnp.int32))
            return dequantize(codes, multiplier(node.bits, node.exp))
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(exported)


def exported_nbytes(exported) -> Tuple[int, int]:
    """(quantized_bytes, float32_bytes) for the exported tree."""
    qb = fb = 0

    def walk(node):
        nonlocal qb, fb
        if isinstance(node, QuantizedLeaf):
            qb += node.codes.size * node.codes.dtype.itemsize + 4
            n = node.codes.size
            if node.packed:
                n = 1
                for d in node.shape:
                    n *= d
            fb += n * 4
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)
        else:
            qb += node.size * node.dtype.itemsize
            fb += node.size * 4

    walk(exported)
    return qb, fb


class Predictor:
    """Checkpoint -> serving handle.

    >>> p = Predictor.from_checkpoint(model, "exp/ckpt")
    >>> labels = p(batch)
    """

    def __init__(self, model: Model, params, qstate,
                 fold_bn: bool = False):
        if fold_bn:
            model, params, qstate = fold_batchnorm(model, params, qstate)
        self.model = model
        self.params = params
        self.qstate = qstate
        self._fn = make_predict_fn(model)

    @classmethod
    def from_checkpoint(cls, model: Model, directory: str,
                        step: Optional[int] = None,
                        fold_bn: bool = False) -> "Predictor":
        params, qstate = model.init(jax.random.key(0))
        state = ckpt.restore_checkpoint(
            directory,
            {"params": params, "qstate": qstate,
             "velocity": params, "epoch": 0},
            step,
        )
        return cls(model, state["params"], state["qstate"],
                   fold_bn=fold_bn)

    def __call__(self, x) -> jax.Array:
        return self._fn(self.params, self.qstate, x)
