"""Action/loss analysis (reference training_results/analyze_actions.py:8-185).

Loss moving averages, the action-selection histogram, best/worst episode
statistics and the do-nothing share, from the standard artifacts
(`<prefix>losses.npy`, `actions.npy`, `rewards.npy`).
"""
from __future__ import annotations

import os

import numpy as np

from .reward import movingaverage


def analyze_actions(save_dir: str, prefix: str, n_actions: int = 181,
                    out: str | None = None):
    losses = np.load(os.path.join(save_dir, prefix + "losses.npy"), allow_pickle=True)
    actions = np.load(os.path.join(save_dir, prefix + "actions.npy"), allow_pickle=True)
    rewards = np.load(os.path.join(save_dir, prefix + "rewards.npy"), allow_pickle=True)

    losses = np.asarray([l for l in losses if l is not None], dtype=np.float64)
    flat_actions = np.concatenate([np.asarray(a, dtype=np.int64) for a in actions]) \
        if len(actions) else np.array([], dtype=np.int64)
    ep_rews = np.array([float(np.sum(r)) for r in rewards]) if len(rewards) else np.array([])

    do_nothing = n_actions - 1
    stats = {
        "grad_steps": int(len(losses)),
        "mean_loss": float(np.mean(losses)) if len(losses) else float("nan"),
        "total_actions": int(len(flat_actions)),
        "do_nothing_share": float(np.mean(flat_actions == do_nothing))
        if len(flat_actions)
        else float("nan"),
        "best_episode": int(np.argmax(ep_rews)) if len(ep_rews) else -1,
        "best_episode_reward": float(np.max(ep_rews)) if len(ep_rews) else float("nan"),
        "worst_episode": int(np.argmin(ep_rews)) if len(ep_rews) else -1,
        "worst_episode_reward": float(np.min(ep_rews)) if len(ep_rews) else float("nan"),
        "mean_episode_length": float(np.mean([len(a) for a in actions]))
        if len(actions)
        else float("nan"),
    }

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    if len(losses):
        axes[0].plot(losses, alpha=0.3)
        for w in (100, 1000):
            if len(losses) >= w:
                axes[0].plot(range(len(losses))[w - 1 :], movingaverage(losses, w))
        axes[0].set(xlabel="Gradient step", ylabel="Huber loss", title="Training loss")
    if len(flat_actions):
        axes[1].hist(flat_actions, bins=min(n_actions, 60))
        axes[1].set(xlabel="Action", ylabel="Count", title="Action selection")
    out = out or os.path.join(save_dir, prefix + "actions_analysis.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return stats
