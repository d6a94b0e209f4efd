"""Orbax checkpointing with actual restore.

The reference only ever *saves* generator state_dicts
(`train.py:290-300`); its --pretrained/--pretrained_root flags never
load anything (SURVEY §2a #22).  Here the FULL train state — both
generators, both discriminators, both optimizer states, replay buffers,
RNG, step — round-trips, fixing the missing-resume gap.

Reference .pth checkpoints are also loadable through
`convert.from_torch` for the pretrained-inference path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from ficsr_tpu.train.state import TrainState

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True),
    )


def save_checkpoint(directory: str, state: TrainState, step: int) -> None:
    mgr = _manager(directory)
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


def restore_checkpoint(directory: str, template: TrainState,
                       step: Optional[int] = None) -> TrainState:
    """Restore into the shape/dtype structure of `template`."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x,
        template,
    )
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return state
