"""Training: optimizer, jitted step, trainer loop, checkpointing."""

from lbt_tpu.train.optim import (  # noqa: F401
    momentum_init,
    momentum_update,
    piecewise_lr,
)
from lbt_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
from lbt_tpu.train.trainer import Trainer  # noqa: F401
