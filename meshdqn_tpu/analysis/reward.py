"""Reward-curve analysis (reference training_results/plot_reward.py:4-84).

Moving averages of the per-episode summed reward over 200/1k/5k/20k-episode
windows, consuming `<prefix>reward.npy` written by MetricsRecorder (or by
the reference's DataHandler — the artifact layout is identical).
"""
from __future__ import annotations

import os

import numpy as np


def movingaverage(values, window):
    weights = np.repeat(1.0, window) / window
    return np.convolve(values, weights, "valid")


def plot_reward(save_dir: str, prefix: str, out: str | None = None,
                windows=(200, 1000, 5000, 20000)):
    rewards = np.load(
        os.path.join(save_dir, prefix + "reward.npy"), allow_pickle=True
    ).astype(np.float64)

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(rewards, alpha=0.3, label="episode reward")
    for w in windows:
        if len(rewards) >= w:
            ax.plot(range(len(rewards))[w - 1 :], movingaverage(rewards, w),
                    label=f"{w}-episode MA")
    ax.set(xlabel="Episode", ylabel="Reward", title="DQN Training Reward")
    ax.legend()
    out = out or os.path.join(save_dir, prefix + "reward_analysis.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return {
        "episodes": int(len(rewards)),
        "mean_reward": float(np.mean(rewards)) if len(rewards) else float("nan"),
        "last_100_mean": float(np.mean(rewards[-100:])) if len(rewards) else float("nan"),
    }
