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

    def save(self, path: str):
        """Persist the full ring (uncompressed npz) so a process restart
        resumes with the same buffer contents instead of an empty one."""
        np.savez(
            path,
            x=self._x, ei=self._ei, ea=self._ea, nm=self._nm, em=self._em,
            action=self._action, reward=self._reward,
            non_final=self._non_final,
            pos=self._pos, size=self._size,
        )

    def load(self, path: str) -> bool:
        z = np.load(path)
        if z["x"].shape != self._x.shape:
            return False  # budgets changed under the same prefix
        self._x[...] = z["x"]; self._ei[...] = z["ei"]
        self._ea[...] = z["ea"]; self._nm[...] = z["nm"]
        self._em[...] = z["em"]; self._action[...] = z["action"]
        self._reward[...] = z["reward"]; self._non_final[...] = z["non_final"]
        self._pos = int(z["pos"]); self._size = int(z["size"])
        return True

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


class ReplayStore(NamedTuple):
    """Device-array pytree backing DeviceReplay (leading [slot, capacity]
    dims as in ReplayBuffer's host rings)."""

    x: jnp.ndarray  # (2, c, n, f) f32
    ei: jnp.ndarray  # (2, c, 2, e) i32
    ea: jnp.ndarray  # (2, c, e) f32
    nm: jnp.ndarray  # (2, c, n) bool
    em: jnp.ndarray  # (2, c, e) bool
    action: jnp.ndarray  # (c,) i32
    reward: jnp.ndarray  # (c,) f32
    non_final: jnp.ndarray  # (c,) bool


def _scatter_store(store: ReplayStore, pos: jnp.ndarray, vals: ReplayStore):
    """Write staged transitions at ring positions `pos` (k,).  Padded slots
    carry pos == capacity (out of bounds) and are dropped by the scatter, so
    one compiled module serves any staged count up to the pad size."""
    return ReplayStore(
        x=store.x.at[:, pos].set(vals.x, mode="drop"),
        ei=store.ei.at[:, pos].set(vals.ei, mode="drop"),
        ea=store.ea.at[:, pos].set(vals.ea, mode="drop"),
        nm=store.nm.at[:, pos].set(vals.nm, mode="drop"),
        em=store.em.at[:, pos].set(vals.em, mode="drop"),
        action=store.action.at[pos].set(vals.action, mode="drop"),
        reward=store.reward.at[pos].set(vals.reward, mode="drop"),
        non_final=store.non_final.at[pos].set(vals.non_final, mode="drop"),
    )


_scatter_store_jit = None


def gather_batch(store: ReplayStore, idx: jnp.ndarray) -> TransitionBatch:
    """On-device gather of a (B,) index batch (traced inside train jits)."""

    def graph(slot):
        return GraphState(
            x=store.x[slot, idx],
            edge_index=store.ei[slot, idx],
            edge_attr=store.ea[slot, idx],
            node_mask=store.nm[slot, idx],
            edge_mask=store.em[slot, idx],
        )

    return TransitionBatch(
        state=graph(0),
        action=store.action[idx],
        next_state=graph(1),
        reward=store.reward[idx],
        non_final=store.non_final[idx],
    )


class DeviceReplay:
    """Device-resident replay ring (same semantics as ReplayBuffer).

    The padded-graph rings live in device memory (~550 MB at capacity
    10k): the trainer stages a sweep's transitions on host and `flush()`
    lands them with ONE small H2D scatter (donated buffers — in-place on
    device), and gradient batches are gathered on device by index
    (rl/dqn.py train_step_many_idx).  Compared to host sampling this
    removes the K*B padded-batch upload (~40 MB per 32-env sweep over the
    remote-TPU link) from every optimize flush.

    `sample_indices` draws from the same rng stream with the same
    uniform-without-replacement distribution as ReplayBuffer.sample_np at
    the same call point; because the gather is deferred to the flush, a
    full ring may serve a slot overwritten later in the same sweep
    (uniform replacement — bit-identical to the host path until the ring
    wraps, distribution-identical after).
    """

    def __init__(self, capacity: int, n_nodes: int, n_features: int, edge_budget: int):
        self.capacity = capacity
        c, n, f, e = capacity, n_nodes, n_features, edge_budget
        self.store = ReplayStore(
            x=jnp.zeros((2, c, n, f), jnp.float32),
            ei=jnp.zeros((2, c, 2, e), jnp.int32),
            ea=jnp.zeros((2, c, e), jnp.float32),
            nm=jnp.zeros((2, c, n), bool),
            em=jnp.zeros((2, c, e), bool),
            action=jnp.zeros(c, jnp.int32),
            reward=jnp.zeros(c, jnp.float32),
            non_final=jnp.zeros(c, bool),
        )
        self._pos = 0
        self._size = 0
        self._staged: list = []
        self._zero = GraphState(
            x=np.zeros((n, f), np.float32),
            edge_index=np.zeros((2, e), np.int32),
            edge_attr=np.zeros(e, np.float32),
            node_mask=np.zeros(n, bool),
            edge_mask=np.zeros(e, bool),
        )

    def push(self, state, action, next_state, reward):
        self._staged.append((state, action, next_state, reward))
        self._pos = (self._pos + 1) % self.capacity
        self._size = min(self._size + 1, self.capacity)

    def __len__(self):
        return self._size

    def sample_indices(self, batch_size: int, rng: np.random.Generator) -> np.ndarray:
        """(B,) int32 indices against the CURRENT ring size (same rng call
        as ReplayBuffer.sample_np)."""
        return rng.choice(self._size, size=batch_size, replace=False).astype(np.int32)

    def flush(self):
        """Land staged transitions on device (one scatter call)."""
        if not self._staged:
            return
        k = len(self._staged)
        start = (self._pos - k) % self.capacity
        # Pad the staged count to a multiple of 8; padded rows get the
        # out-of-bounds position `capacity` and are dropped by the scatter,
        # bounding the number of compiled scatter shapes.
        kp = -(-k // 8) * 8
        pos = np.full(kp, self.capacity, np.int64)
        pos[:k] = (start + np.arange(k)) % self.capacity
        pad = self._zero
        self._staged = self._staged + [(pad, 0, pad, 0.0)] * (kp - k)

        def stack(fn):
            return np.stack([fn(t) for t in self._staged])

        g = lambda s: s if s is not None else self._zero  # noqa: E731
        vals = ReplayStore(
            x=np.stack(
                [stack(lambda t: np.asarray(g(t[0]).x)),
                 stack(lambda t: np.asarray(g(t[2]).x))]
            ),
            ei=np.stack(
                [stack(lambda t: np.asarray(g(t[0]).edge_index)),
                 stack(lambda t: np.asarray(g(t[2]).edge_index))]
            ),
            ea=np.stack(
                [stack(lambda t: np.asarray(g(t[0]).edge_attr)),
                 stack(lambda t: np.asarray(g(t[2]).edge_attr))]
            ),
            nm=np.stack(
                [stack(lambda t: np.asarray(g(t[0]).node_mask)),
                 stack(lambda t: np.asarray(g(t[2]).node_mask))]
            ),
            em=np.stack(
                [stack(lambda t: np.asarray(g(t[0]).edge_mask)),
                 stack(lambda t: np.asarray(g(t[2]).edge_mask))]
            ),
            action=np.array([t[1] for t in self._staged], np.int32),
            reward=np.array([t[3] for t in self._staged], np.float32),
            non_final=np.array([t[2] is not None for t in self._staged], bool),
        )
        self._staged = []
        global _scatter_store_jit
        if _scatter_store_jit is None:
            import jax

            _scatter_store_jit = jax.jit(_scatter_store, donate_argnums=(0,))
        self.store = _scatter_store_jit(
            self.store, jnp.asarray(pos, jnp.int32), vals
        )

    def save(self, path: str):
        """Persist the ring: one device->host readback of the store (D2H
        does not hit the axon client's H2D retention bug, docs/AXON.md)."""
        self.flush()
        np.savez(
            path,
            **{k: np.asarray(v) for k, v in self.store._asdict().items()},
            pos=self._pos, size=self._size,
        )

    def load(self, path: str) -> bool:
        z = np.load(path)
        if z["x"].shape != self.store.x.shape:
            return False  # budgets changed under the same prefix
        self.store = ReplayStore(
            **{k: jnp.asarray(z[k]) for k in ReplayStore._fields}
        )
        self._pos = int(z["pos"]); self._size = int(z["size"])
        return True
