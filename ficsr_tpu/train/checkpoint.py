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

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step",
           "CheckpointWriter"]


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True),
    )


def save_checkpoint(directory: str, state: TrainState, step: int) -> None:
    """One-shot synchronous save (tests, fine-tune end)."""
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


class CheckpointWriter:
    """Async checkpoint writer for the training loop.

    Keeps ONE CheckpointManager alive across the run and lets orbax
    write in the background: `save()` returns as soon as the state is
    staged to host memory, so the next epoch trains while the previous
    checkpoint hits disk.  `close()` (or context exit) drains pending
    writes.  The synchronous `save_checkpoint` re-created the manager
    and blocked on every save.
    """

    def __init__(self, directory: str):
        self._mgr = _manager(directory)

    def save(self, state: TrainState, step: int) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


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
