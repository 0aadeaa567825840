"""Jitted train / eval steps.

One ``train_step`` fuses everything the reference does across two
``Session.run`` calls and three graph-side channels (forward, manual
backward chain, optimizer apply, 'update_range' collection, UPDATE_OPS;
reference trainer.py:144-162) into a single compiled function:

    (params, qstate, velocity, batch, step, lr)
        -> (params', qstate', velocity', metrics)

Backward-site controller updates arrive as cotangents of the zero
``sinks`` pytree (see lbt_tpu/dfxp/barrier.py) and are folded into
``qstate`` by ``model.absorb_sinks``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from lbt_tpu.config import TrainConfig
from lbt_tpu.nn.core import Ctx
from lbt_tpu.nn.model import Model
from lbt_tpu.train.optim import apply_weight_decay, momentum_update


def make_train_step(model: Model, tc: TrainConfig,
                    jit: bool = True, donate: bool = True) -> Callable:
    """Build the (single-device / GSPMD) jitted train step.  The
    explicit shard_map data-parallel variant with the low-bit all-reduce
    lives in lbt_tpu/parallel/dp.py."""
    decay = model.decay_tree()
    # Controller cadence (QuantConfig.range_update_every): K == 1 runs the
    # range controllers every step (reference cadence, trainer.py:157);
    # K > 1 compiles TWO variants of the full step — one with the
    # controller reductions, one with them statically elided — and picks
    # per step with a single lax.cond on (step % K == 0).  A traced gate
    # at every site was measured slower than the reductions it skipped
    # (per-site conditional overhead, benchmarks/BENCH_NOTES.md).
    cadence = getattr(model.cfg, "range_update_every", 1) if model.cfg else 1
    ctrl_warmup = (getattr(model.cfg, "range_update_warmup_steps", 0)
                   if model.cfg else 0)

    def make_loss_fn(gate: bool):
        def loss_fn(params, sinks, qstate, x, y, key):
            ctx = Ctx(train=True, key=key, update=True, update_gate=gate)
            logits, new_qstate = model.apply(params, qstate, sinks, x, ctx)
            loss, acc = model.loss_and_acc(logits, y)
            return loss, (new_qstate, acc)
        return loss_fn

    def make_body(gate: bool):
        loss_fn = make_loss_fn(gate)

        def body(params, qstate, velocity, x, y, key, lr):
            sinks = model.make_sinks()
            (loss, (new_qstate, acc)), (grads, sink_cots) = \
                jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True,
                )(params, sinks, qstate, x, y, key)

            new_qstate = model.absorb_sinks(new_qstate, sink_cots)

            grads = apply_weight_decay(grads, params, decay)
            new_params, new_velocity = momentum_update(
                params, velocity, grads, lr, tc.momentum,
            )
            metrics = {"loss": loss, "accuracy": acc}
            return new_params, new_qstate, new_velocity, metrics
        return body

    body_on = make_body(True)
    body_off = make_body(False) if cadence > 1 else None

    def train_step(params, qstate, velocity, x, y, step, lr, base_key):
        key = jax.random.fold_in(base_key, step)
        if cadence == 1:
            return body_on(params, qstate, velocity, x, y, key, lr)
        run_ctrl = jnp.logical_or(step % cadence == 0, step < ctrl_warmup)
        return jax.lax.cond(
            run_ctrl, body_on, body_off,
            params, qstate, velocity, x, y, key, lr,
        )

    if jit:
        return jax.jit(train_step,
                       donate_argnums=(0, 1, 2) if donate else ())
    return train_step


def make_scan_train_step(model: Model, tc: TrainConfig,
                         unroll_steps: int,
                         donate: bool = True,
                         augment: Optional[Callable] = None) -> Callable:
    """K train steps per dispatch via ``lax.scan``:

        (params, qstate, velocity, xs, ys, step0, lr, key[, aug_key])
            -> (params', qstate', velocity', stacked_metrics)

    with ``xs: [K, B, ...]``, ``ys: [K, B]``.  Amortizes host->device
    dispatch (important over remote/tunneled devices where per-call RPC
    latency rivals the step time) and lets XLA overlap adjacent steps.

    ``augment``: optional on-device (key, x) -> x applied inside the
    scanned body with key ``fold_in(aug_key, step)`` — the same
    derivation the eager Trainer path uses, so trajectories match
    bitwise.
    """
    inner = make_train_step(model, tc, jit=False)

    def scan_step(params, qstate, velocity, xs, ys, step0, lr, base_key,
                  aug_key=None):
        def body(carry, inp):
            params, qstate, velocity, step = carry
            x, y = inp
            if augment is not None:
                x = augment(jax.random.fold_in(aug_key, step), x)
            params, qstate, velocity, metrics = inner(
                params, qstate, velocity, x, y, step, lr, base_key)
            return (params, qstate, velocity, step + 1), metrics

        (params, qstate, velocity, _), metrics = jax.lax.scan(
            body, (params, qstate, velocity, step0), (xs, ys),
            length=unroll_steps)
        return params, qstate, velocity, metrics

    return jax.jit(scan_step,
                   donate_argnums=(0, 1, 2) if donate else ())


def make_eval_step(model: Model, faithful_eval: bool = False,
                   axis_name: Optional[str] = None,
                   jit: bool = True) -> Callable:
    """Eval step: (params, qstate, x, y, key) -> metrics.

    ``faithful_eval`` reproduces the reference's evaluation bug (batch-stat
    BN and live dropout in eval, reference trainer.py:164-165); state is
    never updated either way."""

    def eval_step(params, qstate, x, y, key):
        ctx = Ctx(train=faithful_eval, key=key, update=False)
        sinks = model.make_sinks()
        logits, _ = model.apply(params, qstate, sinks, x, ctx)
        loss, acc = model.loss_and_acc(logits, y)
        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
            acc = jax.lax.pmean(acc, axis_name)
        return {"loss": loss, "accuracy": acc,
                "count": jnp.float32(x.shape[0])}

    return jax.jit(eval_step) if jit else eval_step


def make_masked_eval_step(model: Model, faithful_eval: bool = False,
                          jit: bool = True) -> Callable:
    """Data-parallel eval step over batch-padded inputs.

    (params, qstate, x, y, n_valid, key) -> {loss_sum, correct_sum}
    summed over the first ``n_valid`` rows only.  Batches are padded to
    one static shape so the eval set compiles once and shards evenly
    over the mesh 'data' axis (the ragged final batch rides as padding);
    the Trainer divides the accumulated sums by the true example count.
    GSPMD inserts the cross-shard reductions when x/y are sharded.
    """

    def eval_step(params, qstate, x, y, n_valid, key):
        ctx = Ctx(train=faithful_eval, key=key, update=False)
        sinks = model.make_sinks()
        logits, _ = model.apply(params, qstate, sinks, x, ctx)
        logits = logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        ll = jnp.take_along_axis(
            logits, y[:, None].astype(jnp.int32), axis=-1)[:, 0]
        ce = logz - ll
        correct = (jnp.argmax(logits, axis=-1) == y).astype(jnp.float32)
        mask = (jnp.arange(x.shape[0]) < n_valid).astype(jnp.float32)
        return {"loss_sum": jnp.sum(ce * mask),
                "correct_sum": jnp.sum(correct * mask)}

    return jax.jit(eval_step) if jit else eval_step
