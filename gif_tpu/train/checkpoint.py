"""Orbax checkpointing of the full train state.

Replaces the reference's torch ``.model`` + ``.npz`` sidecar pair
(train.py:254-265, :389-400) with one Orbax pytree checkpoint holding G, D,
G-EMA, both optimizer states, and the loop counters — multi-host safe and
resume-by-construction (SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from gif_tpu.train.state import TrainState


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager with the reference cadence."""

    def __init__(self, directory: str, max_to_keep: int = 5, save_every: int = 1000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_every = save_every
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def maybe_save(self, state: TrainState, step: Optional[int] = None) -> bool:
        """Save iff the step hits the cadence (reference: every 1000 iters).

        Pass ``step`` (the loop's python counter) when calling per
        iteration: reading ``int(state.step)`` is a blocking device->host
        sync that would stall the dispatch pipeline every step."""
        step = int(state.step) if step is None else step
        if step % self.save_every != 0:
            return False
        self.save(state)
        return True

    def save(self, state: TrainState) -> None:
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def all_steps(self) -> list:
        """Every retained checkpoint step, ascending (offline trend
        analysis: scripts/recon_trend.py)."""
        return sorted(self._mgr.all_steps())

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``abstract_state`` (from
        create_train_state)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def close(self):
        self._mgr.close()
