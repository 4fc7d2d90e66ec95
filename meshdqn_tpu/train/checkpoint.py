"""Versioned checkpoint/resume via orbax.

Replaces the reference's fragile RESTART scheme — counting
`policy_net_1.pt` files to derive a restart number, re-prefixing every
artifact `restart_...`, and replaying the LR scheduler a hard-coded 449,129
steps (airfoil_dqn.py:359-366, 177-179; SURVEY.md §5 checkpoint/resume).
One orbax directory holds everything needed to resume exactly: both nets,
both optimizer states, the grad/select counters, the global epsilon step and
the NumPy RNG state.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..rl.dqn import DQNState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, dqn: DQNState, extras: dict[str, Any]):
        """extras: JSON-able counters (global_step, episode, rng_state...)."""
        payload = {
            "dqn": dqn._asdict(),
            "extras": extras,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template_dqn: DQNState) -> tuple[DQNState, dict, int] | None:
        step = self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "dqn": template_dqn._asdict(),
            "extras": None,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        dqn = DQNState(**restored["dqn"])
        return dqn, restored["extras"], step
