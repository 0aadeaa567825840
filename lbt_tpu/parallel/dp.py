"""Data-parallel train step under ``shard_map``.

Params/state replicated, batch sharded over the ``data`` axis; gradients
mean-all-reduced — either exactly (f32 ``pmean``) or in DFXP-int8 with a
shared exponent and error feedback (lbt_tpu/parallel/lowbit.py).
Quantizer exponents, BN statistics and backward overflow stats are
pmean-synchronized inside the step (see Ctx.psum_axis), so all replicated
state stays bitwise identical across shards.

Plain DP without the low-bit collective can also be had with ordinary
``jax.jit`` + batch sharding (GSPMD inserts the psum); this explicit
shard_map path exists because the low-bit all-reduce needs manual control
of the collective.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lbt_tpu.config import TrainConfig
from lbt_tpu.nn.core import Ctx
from lbt_tpu.nn.model import Model
from lbt_tpu.parallel.lowbit import lowbit_allreduce, ring_lowbit_allreduce
from lbt_tpu.train.optim import apply_weight_decay, momentum_update

AXIS = "data"


def make_dp_train_step(model: Model, tc: TrainConfig, mesh: Mesh,
                       lowbit_bits: Optional[int] = None,
                       lowbit_wire: Optional[str] = None,
                       donate: bool = True):
    """Returns a jitted step:

        (params, qstate, velocity, ebuf, x, y, step, lr, key)
            -> (params', qstate', velocity', ebuf', metrics)

    ``ebuf`` are the per-leaf error-feedback buffers (zeros_like(params));
    ignored (threaded through) when ``lowbit_bits`` is None.

    ``lowbit_wire``: None -> psum transport (int16 when exact, else
    int32); 'int16'/'int8' -> explicit ppermute ring collective
    (lbt_tpu/parallel/lowbit.py) at that wire width.
    """
    decay = model.decay_tree()
    n_shards = mesh.shape[AXIS]
    cadence = getattr(model.cfg, "range_update_every", 1) if model.cfg else 1
    ctrl_warmup = (getattr(model.cfg, "range_update_warmup_steps", 0)
                   if model.cfg else 0)

    def make_loss_fn(gate: bool):
        def loss_fn(params, sinks, qstate, x, y, key):
            ctx = Ctx(train=True, key=key, update=True, psum_axis=AXIS,
                      update_gate=gate)
            logits, new_qstate = model.apply(params, qstate, sinks, x, ctx)
            loss, acc = model.loss_and_acc(logits, y)
            # global-batch 1/N loss scaling (see train/step.py): backward
            # cotangent magnitudes then match a single-device full-batch
            # run
            loss = loss / jax.lax.psum(jnp.float32(1.0), AXIS)
            return loss, (new_qstate, acc)
        return loss_fn

    def make_step_fn(gate: bool):
        loss_fn = make_loss_fn(gate)

        def step_fn(params, qstate, velocity, ebuf, x, y, step, lr,
                    base_key):
            key = jax.random.fold_in(base_key, step)
            key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
            sinks = model.make_sinks()
            (loss, (new_qstate, acc)), (grads, sink_cots) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True,
            )(params, sinks, qstate, x, y, key)

            sink_cots = jax.lax.pmean(sink_cots, AXIS)
            new_qstate = model.absorb_sinks(new_qstate, sink_cots)

            if lowbit_bits is not None:
                if lowbit_wire is not None:
                    grads, new_ebuf = ring_lowbit_allreduce(
                        grads, ebuf, AXIS, n_shards, bits=lowbit_bits,
                        wire=lowbit_wire, reduce="sum")
                else:
                    grads, new_ebuf = lowbit_allreduce(
                        grads, ebuf, AXIS, bits=lowbit_bits, reduce="sum",
                        num_shards=n_shards)
            else:
                grads = jax.lax.psum(grads, AXIS)
                new_ebuf = ebuf

            loss = jax.lax.psum(loss, AXIS)
            acc = jax.lax.pmean(acc, AXIS)

            grads = apply_weight_decay(grads, params, decay)
            new_params, new_velocity = momentum_update(
                params, velocity, grads, lr, tc.momentum)
            return (new_params, new_qstate, new_velocity, new_ebuf,
                    {"loss": loss, "accuracy": acc})

        return step_fn

    def compile_variant(gate: bool):
        # Manual only over 'data' (the axis the low-bit collective needs
        # explicit control of); any other mesh axis — 'model' for tensor
        # parallelism — stays AUTO, so GSPMD partitions the contractions
        # of tp-sharded weights and inserts the model-axis collectives
        # inside the per-data-shard body.  TP x lowbit composes: grads of
        # 'model'-sharded leaves ride their auto sharding through the
        # data-axis psum/ppermute.
        mapped = jax.shard_map(
            make_step_fn(gate),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(AXIS), P(AXIS), P(), P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
            axis_names=frozenset({AXIS}),
            check_vma=False,
        )
        return jax.jit(mapped,
                       donate_argnums=(0, 1, 2, 3) if donate else ())

    step_on = compile_variant(True)
    if cadence == 1:
        return step_on
    # Controller cadence under DP: the on/off variants differ in their
    # collective structure (the on-variant pmeans overflow rates), so the
    # choice is made on the HOST per step — the step index is a Python
    # int in the Trainer's eager loop — instead of a lax.cond whose
    # branches would contain collectives.
    step_off = compile_variant(False)

    def dispatch(params, qstate, velocity, ebuf, x, y, step, lr, base_key):
        idx = int(step)  # requires a host-side step index
        fn = (step_on if idx % cadence == 0 or idx < ctrl_warmup
              else step_off)
        return fn(params, qstate, velocity, ebuf, x, y, step, lr, base_key)

    return dispatch
