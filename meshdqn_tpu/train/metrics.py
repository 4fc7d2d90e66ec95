"""Training metrics recorder.

Drop-in equivalent of the reference's DataHandler Ray actor
(airfoil_dqn.py:76-147): accumulates per-step rewards, per-episode reward
lists, losses, actions and epsilon values, and writes the same five .npy
artifacts (`<prefix>reward.npy`, `rewards.npy`, `losses.npy`, `actions.npy`,
`eps.npy`) plus the moving-average reward plot — so the reference's analysis
scripts (training_results/plot_reward.py, analyze_actions.py) consume our
runs unchanged.
"""
from __future__ import annotations

import os

import numpy as np


def _movingaverage(values, window):
    weights = np.repeat(1.0, window) / window
    return np.convolve(values, weights, "valid")


class MetricsRecorder:
    def __init__(self, save_dir: str, prefix: str = ""):
        self.save_dir = save_dir
        self.prefix = prefix
        os.makedirs(save_dir, exist_ok=True)
        self.rewards: list[float] = []  # per-episode summed reward
        self.ep_rewards: list[list] = []  # per-episode reward lists
        self.losses: list[float] = []
        self.actions: list[list] = []
        self.epss: list[float] = []
        self._pending: list = []  # device loss scalars awaiting readback

    # -- accumulation (DataHandler API) --------------------------------
    def add_eps(self, eps: float):
        self.epss.append(eps)

    def num_eps(self) -> int:
        return len(self.epss)

    def add_loss(self, loss):
        """Accepts a float OR a device scalar.  Device scalars are kept
        un-synchronized and flushed in one batched readback — a per-step
        `float(loss)` would force a host sync per gradient step, which on a
        remote-TPU link costs more than the step itself."""
        self._pending.append(loss)
        if len(self._pending) >= 256:
            self._flush_losses()

    def _flush_losses(self):
        if not self._pending:
            return
        import jax.numpy as jnp

        vals = np.asarray(jnp.stack([jnp.asarray(v) for v in self._pending]))
        self.losses.extend(float(v) for v in vals)
        self._pending = []

    def add_episode(self, ep_rew: list, ep_action: list):
        self.rewards.append(float(np.sum(ep_rew)))
        self.ep_rewards.append(list(ep_rew))
        self.actions.append(list(ep_action))

    # -- artifacts ------------------------------------------------------
    def _p(self, name: str) -> str:
        return os.path.join(self.save_dir, self.prefix + name)

    def _atomic_save(self, name: str, values: list):
        """np.save via tmp + rename: a kill mid-write (stall watchdog,
        SIGTERM) must never truncate the committed artifact — a corrupt
        rewards.npy crash-looped resume for an hour in round 4."""
        path = self._p(name)
        tmp = path + ".tmp.npy"
        np.save(tmp, np.array(values, dtype=object), allow_pickle=True)
        os.replace(tmp, path)

    def write(self):
        self._flush_losses()
        self._atomic_save("reward.npy", self.rewards)
        self._atomic_save("rewards.npy", self.ep_rewards)
        self._atomic_save("losses.npy", self.losses)
        self._atomic_save("actions.npy", self.actions)
        self._atomic_save("eps.npy", self.epss)

    def load(self):
        """Resume accumulation from previously written artifacts."""
        def _load(name, default):
            try:
                return list(np.load(self._p(name), allow_pickle=True))
            except OSError:
                return default

        self.rewards = [float(r) for r in _load("reward.npy", [])]
        self.ep_rewards = _load("rewards.npy", [])
        self.losses = _load("losses.npy", [])
        self.actions = _load("actions.npy", [])
        self.epss = _load("eps.npy", [])

    def truncate(self, episodes: int, steps: int, losses: int | None = None):
        """Align resumed arrays with the restored checkpoint counters.

        Metric writes and checkpoint saves happen on independent cadences,
        so packed arrays can run a few entries AHEAD of the checkpoint the
        run actually resumes from; without truncation those trailing
        episodes/steps are re-run and appended twice (ADVICE r3).  Loss
        count lags global_step (skip-until-batch), so it is truncated to
        the exact count recorded in the checkpoint when available and left
        alone otherwise."""
        self.rewards = self.rewards[:episodes]
        self.ep_rewards = self.ep_rewards[:episodes]
        self.actions = self.actions[:episodes]
        self.epss = self.epss[:steps]
        if losses is not None:
            self.losses = self.losses[: int(losses)]

    def plot(self):
        self._flush_losses()
        try:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt
        except ImportError:  # headless fallback
            return
        fig, ax = plt.subplots()
        ax.plot(self.rewards)
        if len(self.rewards) >= 25:
            ax.plot(range(len(self.rewards))[24:], _movingaverage(self.rewards, 25))
        if len(self.rewards) >= 200:
            ax.plot(range(len(self.rewards))[199:], _movingaverage(self.rewards, 200))
        ax.set(xlabel="Episode", ylabel="Reward")
        ax.set_title("DQN Training Reward")
        fig.savefig(self._p("reward.png"))
        plt.close(fig)
