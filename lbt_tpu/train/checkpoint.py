"""Checkpoint save/restore via Orbax.

The reference saves once at the very end and has no restore path at all
(reference trainer.py:189-192, SURVEY.md §5.4).  Here the full training
state — params, quantizer exponents + BN stats, momentum slots, step —
is checkpointed periodically as first-class pytree leaves and can be
resumed exactly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True,
        ),
    )


def save_checkpoint(directory: str, step: int, state: Dict[str, Any],
                    max_to_keep: int = 3) -> None:
    """state: {'params':..., 'qstate':..., 'velocity':..., 'epoch': int}"""
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, template: Dict[str, Any],
                       step: Optional[int] = None) -> Dict[str, Any]:
    """Restore into the structure/shardings of ``template``."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return state
