#!/usr/bin/env python
"""Is a pack's end-of-run reward slope a decline or plateau noise?

VERDICT r4 weak #1: both committed packs ended with negative
`reward_slope_per_1k` (ys930 −0.62, ah93w145 −0.25) after the r4 collapse
post-mortem, and the judge asked for a root-cause before it becomes
collapse #2.  This script settles it with the distribution of the SAME
slope estimator (MA1000_last − MA1000_prev, PACK.json's
`reward_slope_per_1k`) evaluated at every episode of the plateau window:
if the final value sits inside the stationary oscillation band, the run is
plateaued (an eps-floor=0.05 policy keeps injecting exploration noise and
the MA oscillates); if it sits below the band, the run is genuinely
declining.

Writes a JSON verdict per run and a combined PNG of the MA curves with the
slope band, for docs/TRAINING_PLATEAU.md.

Usage: python scripts/pack_slope_analysis.py [--runs checkpoints/ys930_results ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(run_dir: str, window: int = 1000, plateau: int = 10000) -> dict:
    name = os.path.basename(run_dir.rstrip("/"))
    prefix = os.path.join(run_dir, name + "_")
    eps_r = np.array(
        [np.sum(x) for x in np.load(prefix + "rewards.npy", allow_pickle=True)],
        dtype=float,
    )
    ma = np.convolve(eps_r, np.ones(window) / window, mode="valid")
    slopes = ma[window:] - ma[:-window]
    band = slopes[-plateau:]
    final = float(band[-1])
    mean, std = float(band.mean()), float(band.std())
    p5, p95 = (float(np.percentile(band, q)) for q in (5, 95))
    z = (final - mean) / std if std else float("nan")
    return {
        "run": name,
        "episodes": int(len(eps_r)),
        "ma1000_final": round(float(ma[-1]), 3),
        "ma1000_best": round(float(ma.max()), 3),
        "ma1000_best_episode": int(np.argmax(ma) + window),
        "slope_final_per_1k": round(final, 3),
        "slope_band_mean": round(mean, 3),
        "slope_band_std": round(std, 3),
        "slope_band_p5": round(p5, 3),
        "slope_band_p95": round(p95, 3),
        "slope_final_z": round(z, 2),
        "plateau_window_episodes": plateau,
        # Inside the band = plateau oscillation, not decline.
        "verdict": "plateau" if p5 <= final else "declining",
        "_ma": ma,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--runs", nargs="*",
        default=["checkpoints/ys930_results", "checkpoints/ah93w145_results"],
    )
    ap.add_argument("--out", default="docs/examples/pack_slope_analysis")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(
        1, len(args.runs), figsize=(6 * len(args.runs), 4), squeeze=False
    )
    results = []
    for ax, run in zip(axes[0], args.runs):
        r = analyze(run)
        ma = r.pop("_ma")
        results.append(r)
        x = np.arange(len(ma)) + 1000
        ax.plot(x, ma, lw=0.8)
        ax.axhline(r["ma1000_best"], color="tab:green", ls="--", lw=0.8,
                   label=f"best {r['ma1000_best']:.2f}")
        ax.set_title(
            f"{r['run']}: final slope {r['slope_final_per_1k']:+.2f}/1k "
            f"(band {r['slope_band_p5']:+.2f}..{r['slope_band_p95']:+.2f}) "
            f"-> {r['verdict']}"
        )
        ax.set_xlabel("episode"); ax.set_ylabel("reward MA1000")
        ax.legend(loc="lower right", fontsize=8)
        print(json.dumps(r, indent=1))
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out + ".png", dpi=110)
    with open(args.out + ".json", "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {args.out}.png / .json")


if __name__ == "__main__":
    main()
