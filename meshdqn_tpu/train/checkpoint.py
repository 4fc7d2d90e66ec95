"""Versioned checkpoint/resume via orbax.

Replaces the reference's fragile RESTART scheme — counting
`policy_net_1.pt` files to derive a restart number, re-prefixing every
artifact `restart_...`, and replaying the LR scheduler a hard-coded 449,129
steps (airfoil_dqn.py:359-366, 177-179; SURVEY.md §5 checkpoint/resume).
One checkpoint directory per step holds both nets + both optimizer states +
counters (orbax StandardCheckpointer) and a JSON sidecar with host-side
counters; resume restores everything exactly, optimizer moments included.
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any

import orbax.checkpoint as ocp

from ..rl.dqn import DQNState

_STEP_RE = re.compile(r"^step_(\d+)$")


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._ckptr = ocp.StandardCheckpointer()

    def _steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m and os.path.exists(
                os.path.join(self.directory, name, "extras.json")
            ):
                out.append(int(m.group(1)))
        return sorted(out)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def save(self, step: int, dqn: DQNState, extras: dict[str, Any]):
        path = self._path(step)
        tree_path = os.path.join(path, "tree")
        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        self._ckptr.save(tree_path, dqn._asdict())
        self._ckptr.wait_until_finished()
        with open(os.path.join(path, "extras.json"), "w") as f:
            json.dump(extras, f)
        # Retention.
        steps = self._steps()
        for old in steps[: -self.max_to_keep]:
            shutil.rmtree(self._path(old), ignore_errors=True)

    def latest_step(self) -> int | None:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(self, template_dqn: DQNState):
        step = self.latest_step()
        if step is None:
            return None
        path = self._path(step)
        restored = self._ckptr.restore(
            os.path.join(path, "tree"), template_dqn._asdict()
        )
        with open(os.path.join(path, "extras.json")) as f:
            extras = json.load(f)
        return DQNState(**restored), extras, step
