"""Replay buffer over padded graph transitions.

The reference's ReplayMemory is a Ray actor holding a Python list of PyG
objects (airfoil_dqn.py:48-67).  Here: preallocated host NumPy rings of the
padded graph tensors — sampling a batch is pure slicing that lands on device
as one transfer, and the capacity-10k buffer is ~350 MB instead of 10k
Python objects.

Terminal transitions store a zeroed next-state and non_final=False, which the
DQN target masks out (the reference passes literal None and rebuilds a mask
per batch, airfoil_dqn.py:246-248).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..env.graph import GraphState


class TransitionBatch(NamedTuple):
    state: GraphState  # leaves have leading batch dim
    action: jnp.ndarray  # (B,) int32
    next_state: GraphState
    reward: jnp.ndarray  # (B,) f32
    non_final: jnp.ndarray  # (B,) bool


class ReplayBuffer:
    def __init__(self, capacity: int, n_nodes: int, n_features: int, edge_budget: int):
        self.capacity = capacity
        c, n, f, e = capacity, n_nodes, n_features, edge_budget
        self._x = np.zeros((2, c, n, f), dtype=np.float32)  # [state, next]
        self._ei = np.zeros((2, c, 2, e), dtype=np.int32)
        self._ea = np.zeros((2, c, e), dtype=np.float32)
        self._nm = np.zeros((2, c, n), dtype=bool)
        self._em = np.zeros((2, c, e), dtype=bool)
        self._action = np.zeros(c, dtype=np.int32)
        self._reward = np.zeros(c, dtype=np.float32)
        self._non_final = np.zeros(c, dtype=bool)
        self._pos = 0
        self._size = 0

    def push(
        self,
        state: GraphState,
        action: int,
        next_state: GraphState | None,
        reward: float,
    ):
        i = self._pos
        for slot, g in ((0, state), (1, next_state)):
            if g is None:
                self._x[slot, i] = 0
                self._ei[slot, i] = 0
                self._ea[slot, i] = 0
                self._nm[slot, i] = False
                self._em[slot, i] = False
            else:
                self._x[slot, i] = np.asarray(g.x)
                self._ei[slot, i] = np.asarray(g.edge_index)
                self._ea[slot, i] = np.asarray(g.edge_attr)
                self._nm[slot, i] = np.asarray(g.node_mask)
                self._em[slot, i] = np.asarray(g.edge_mask)
        self._action[i] = action
        self._reward[i] = reward
        self._non_final[i] = next_state is not None
        self._pos = (self._pos + 1) % self.capacity
        self._size = min(self._size + 1, self.capacity)

    def __len__(self):
        return self._size

    def sample_np(self, batch_size: int, rng: np.random.Generator) -> TransitionBatch:
        """Sample a batch as host NumPy arrays (no device transfer).

        Used to draw several batches against successive buffer states and
        ship them to the device as one stacked transfer (train_step_many)."""
        idx = rng.choice(self._size, size=batch_size, replace=False)

        def graph(slot):
            return GraphState(
                x=self._x[slot, idx],
                edge_index=self._ei[slot, idx],
                edge_attr=self._ea[slot, idx],
                node_mask=self._nm[slot, idx],
                edge_mask=self._em[slot, idx],
            )

        return TransitionBatch(
            state=graph(0),
            action=self._action[idx],
            next_state=graph(1),
            reward=self._reward[idx],
            non_final=self._non_final[idx],
        )

    def sample(self, batch_size: int, rng: np.random.Generator) -> TransitionBatch:
        idx = rng.choice(self._size, size=batch_size, replace=False)
        def graph(slot):
            return GraphState(
                x=jnp.asarray(self._x[slot, idx]),
                edge_index=jnp.asarray(self._ei[slot, idx]),
                edge_attr=jnp.asarray(self._ea[slot, idx]),
                node_mask=jnp.asarray(self._nm[slot, idx]),
                edge_mask=jnp.asarray(self._em[slot, idx]),
            )

        return TransitionBatch(
            state=graph(0),
            action=jnp.asarray(self._action[idx]),
            next_state=graph(1),
            reward=jnp.asarray(self._reward[idx]),
            non_final=jnp.asarray(self._non_final[idx]),
        )


def stack_batches(batches: list[TransitionBatch]) -> TransitionBatch:
    """Stack K host batches into one (K, B, ...) device-ready TransitionBatch."""
    import jax

    return jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs)), *batches
    )
