"""SGD with momentum + LR schedule.

Matches ``tf.train.MomentumOptimizer`` semantics (the reference's only
optimizer, reference trainer.py:79-84):

    v   <- momentum * v + g
    w   <- w - lr * v

Weight decay is applied *in-gradient* by the train step before this
update (``g + 2 * wd * w``, reference dynamic_fixed_point.py:302,457,689),
not decoupled.

The LR schedule is the reference's hard-coded piecewise decay at epochs
{80,120,140} x 0.1 (reference trainer.py:117-132), exposed as real knobs.
The reference also re-creates the optimizer at each decay, zeroing the
momentum slots (reference trainer.py:79-84); that quirk is opt-in via
``TrainConfig.reset_momentum_on_decay`` (the trainer re-inits the slots).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def momentum_init(params):
    return jax.tree.map(jnp.zeros_like, params)


def momentum_update(params, velocity, grads, lr, momentum: float):
    """Returns (new_params, new_velocity)."""
    new_v = jax.tree.map(lambda v, g: momentum * v + g, velocity, grads)
    new_p = jax.tree.map(lambda p, v: p - lr * v, params, new_v)
    return new_p, new_v


def piecewise_lr(base_lr: float, decay_factor: float,
                 decay_epochs: Sequence[int], epoch: int,
                 warmup_epochs: int = 0) -> float:
    """Host-side LR for a given epoch (static per epoch).

    ``warmup_epochs``: linear ramp from base_lr/warmup to base_lr over
    the first epochs.  The reference has no warmup; DFXP training with
    augmentation sits near a divergence edge at full LR from step 0
    (quantized weights clip instead of recovering from an early
    excursion), so a short warmup is recommended for ResNet recipes.
    """
    if warmup_epochs > 0 and epoch < warmup_epochs:
        return base_lr * (epoch + 1) / warmup_epochs
    lr = base_lr
    for e in decay_epochs:
        if epoch >= e:
            lr *= decay_factor
    return lr


def apply_weight_decay(grads, params, decay_tree):
    """Reference in-gradient L2: g + 2 * wd * w (dynamic_fixed_point.py:302)."""
    return jax.tree.map(
        lambda g, p, d: g + (2.0 * d) * p if d else g,
        grads, params, decay_tree,
    )
