"""Checkpoint / resume via orbax.

The reference has NO checkpointing (SURVEY.md §5.4 — fixed-epoch benchmark
runs, model state lives in the torch app and is discarded). On TPU the
idiomatic upgrade is orbax: save (TrainState, epoch) per epoch, restore on
restart. Engines call these helpers opportunistically; everything degrades
to a no-op if orbax is unavailable.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from ..utils import get_logger

log = get_logger(__name__)

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked into the image
    ocp = None
    _HAVE_ORBAX = False


class CheckpointManager:
    """Thin orbax wrapper: one directory, keep-N, (state, epoch) payloads."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self._mgr = None
        if _HAVE_ORBAX:
            os.makedirs(self.directory, exist_ok=True)
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True
                ),
            )

    @property
    def available(self) -> bool:
        return self._mgr is not None

    def save(self, epoch: int, state) -> None:
        if self._mgr is None:
            return
        # host-side copy: donated/sharded device buffers serialize via
        # the standard pytree handler
        host_state = jax.tree.map(np.asarray, state)
        self._mgr.save(epoch, args=ocp.args.StandardSave(host_state))
        self._mgr.wait_until_finished()
        log.info("checkpoint: saved epoch %d -> %s", epoch, self.directory)

    def latest_epoch(self) -> Optional[int]:
        if self._mgr is None:
            return None
        return self._mgr.latest_step()

    def restore(self, state_like) -> Optional[Tuple[object, int]]:
        """Restore the latest checkpoint shaped like `state_like`.

        Returns (state, epoch) or None if nothing to restore."""
        if self._mgr is None:
            return None
        step = self._mgr.latest_step()
        if step is None:
            return None
        host_like = jax.tree.map(np.asarray, state_like)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(host_like)
        )
        log.info("checkpoint: restored epoch %d from %s", step,
                 self.directory)
        return restored, step
