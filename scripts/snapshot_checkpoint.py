#!/usr/bin/env python
"""Persist / restore slim training resume packs across repo clones.

`training_results/` is gitignored (replay rings and event logs grow to
hundreds of MB), which means trained policies are lost whenever the build
moves to a fresh clone.  This tool copies the SMALL, sufficient subset of a
run directory into `checkpoints/<run>/` (committed) and back:

  * ckpt/step_<latest>/    — orbax tree (both nets + optimizer states) and
                             the counters sidecar (train/checkpoint.py)
  * *_reward.npy, *_rewards.npy, *_losses.npy, *_actions.npy, *_eps.npy
    — metrics arrays so resumed runs keep their full learning curves
  * ground_truth.npz + ground_truth_meta.json — skips the ~15 min
    fresh-prefix ground-truth solve on restore (fingerprint-guarded by
    train/gtcache.py, so a stale pack is recomputed, never trusted)
  * config.yaml — provenance

The replay ring (replay.npz) and train_log.jsonl are deliberately NOT
packed: the ring re-warms within ~batch_size env steps and the JSONL is an
append-only event log, not resume state.

Usage:
  python scripts/snapshot_checkpoint.py save   <run>   # training_results/<run> -> checkpoints/<run>
  python scripts/snapshot_checkpoint.py restore <run>  # checkpoints/<run> -> training_results/<run>
  python scripts/snapshot_checkpoint.py restore --all  # every packed run
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "training_results")
PACKS = os.path.join(REPO, "checkpoints")

METRIC_SUFFIXES = ("reward", "rewards", "losses", "actions", "eps")


def _latest_ckpt_step(ckpt_dir: str) -> str | None:
    steps = []
    for name in os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else []:
        if name.startswith("step_") and os.path.exists(
            os.path.join(ckpt_dir, name, "extras.json")
        ):
            steps.append(int(name.split("_", 1)[1]))
    return f"step_{max(steps)}" if steps else None


def save(run: str) -> None:
    src = os.path.join(RUNS, run)
    dst = os.path.join(PACKS, run)
    step = _latest_ckpt_step(os.path.join(src, "ckpt"))
    if step is None:
        sys.exit(f"no complete checkpoint under {src}/ckpt")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(os.path.join(dst, "ckpt"), exist_ok=True)
    shutil.copytree(
        os.path.join(src, "ckpt", step), os.path.join(dst, "ckpt", step)
    )
    copied = [f"ckpt/{step}"]
    # Best-policy snapshot (train/trainer.py ckpt_best): pack it alongside
    # the latest checkpoint so a late-training collapse cannot destroy the
    # deliverable policy across VM recycles.
    best_step = _latest_ckpt_step(os.path.join(src, "ckpt_best"))
    if best_step is not None:
        shutil.copytree(
            os.path.join(src, "ckpt_best", best_step),
            os.path.join(dst, "ckpt_best", best_step),
        )
        copied.append(f"ckpt_best/{best_step}")
    # Deploy-probe high-water snapshot (train/trainer.py _deploy_probe):
    # the policy a greedy deployment should load — selected by verified
    # removal count, not training reward (the two diverge once the policy
    # discovers do-nothing farming).
    deploy_step = _latest_ckpt_step(os.path.join(src, "ckpt_best_deploy"))
    if deploy_step is not None:
        shutil.copytree(
            os.path.join(src, "ckpt_best_deploy", deploy_step),
            os.path.join(dst, "ckpt_best_deploy", deploy_step),
        )
        copied.append(f"ckpt_best_deploy/{deploy_step}")
    for pattern in ("*.npy", "config.yaml", "ground_truth.npz",
                    "ground_truth_meta.json"):
        for path in glob.glob(os.path.join(src, pattern)):
            base = os.path.basename(path)
            if pattern == "*.npy" and not any(
                base.endswith(f"_{s}.npy") for s in METRIC_SUFFIXES
            ):
                continue
            if pattern == "*.npy":
                # Never pack (and git-commit) a truncated artifact: a kill
                # mid-metrics-write once shipped a corrupt rewards.npy into
                # the pack, poisoning every later restore.
                try:
                    np.load(path, allow_pickle=True)
                except Exception as e:
                    print(f"SKIP corrupt {base}: {type(e).__name__}")
                    continue
            shutil.copy2(path, os.path.join(dst, base))
            copied.append(base)
    with open(os.path.join(src, "ckpt", step, "extras.json")) as f:
        extras = json.load(f)
    if best_step is not None:
        try:
            with open(
                os.path.join(src, "ckpt_best", best_step, "extras.json")
            ) as f:
                b = json.load(f)
            extras["best_episode"] = b.get("episode")
            extras["best_ma1000"] = b.get("best_ma1000")
        except OSError:
            pass
    if deploy_step is not None:
        try:
            with open(
                os.path.join(src, "ckpt_best_deploy", deploy_step, "extras.json")
            ) as f:
                b = json.load(f)
            extras["best_deploy_episode"] = b.get("episode")
            extras["best_deploy_removals"] = b.get("best_deploy_removals")
            extras["best_deploy_reward"] = round(
                float(b.get("best_deploy_reward", float("nan"))), 3
            )
        except (OSError, TypeError, ValueError):
            pass
    # Reward-trend summary so a diverging run is visible in `git log -p`
    # without unpickling npy files (round-2's late-training collapse sat
    # unnoticed inside committed packs).
    trend = {}
    rpath = os.path.join(dst, f"{run}_reward.npy")
    if os.path.exists(rpath):
        rew = np.load(rpath, allow_pickle=True)
        try:
            rew = np.asarray(rew, dtype=np.float64)
        except (TypeError, ValueError):
            rew = np.asarray([float(np.sum(r)) for r in rew])
        n = len(rew)
        trend["episodes"] = int(n)
        if n >= 200:
            last = rew[-1000:]
            prev = rew[-2000:-1000] if n >= 2000 else rew[: max(n - 1000, 100)]
            trend["reward_ma_last1000"] = round(float(np.mean(last)), 4)
            trend["reward_ma_prev1000"] = round(float(np.mean(prev)), 4)
            trend["reward_slope_per_1k"] = round(
                float(np.mean(last) - np.mean(prev)), 4
            )
            trend["reward_ma_last100"] = round(float(np.mean(rew[-100:])), 4)
    # Value-health summary: the per-step Huber loss median is O(1) on a
    # healthy run and climbs into 1e4+ under value runaway (the round-2/3
    # divergence signature) — surface it next to the reward trend.
    lpath = os.path.join(dst, f"{run}_losses.npy")
    if os.path.exists(lpath):
        try:
            losses = np.load(lpath, allow_pickle=True).astype(np.float64)
            if len(losses):
                tail = losses[-10000:]
                trend["grad_steps"] = int(len(losses))
                trend["loss_median_last10k"] = round(float(np.median(tail)), 4)
                trend["loss_p99_last10k"] = round(
                    float(np.percentile(tail, 99)), 3
                )
        except (TypeError, ValueError):
            pass
    with open(os.path.join(dst, "PACK.json"), "w") as f:
        json.dump({"run": run, "step": step, **extras, **trend}, f, indent=1)
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(dst)
        for f in fs
    )
    print(f"packed {run}: {copied} ({total / 1e6:.1f} MB) -> {dst}")


def restore(run: str) -> None:
    src = os.path.join(PACKS, run)
    dst = os.path.join(RUNS, run)
    if not os.path.isdir(src):
        sys.exit(f"no pack at {src}")
    step = _latest_ckpt_step(os.path.join(src, "ckpt"))
    if step is None:
        sys.exit(f"pack {src} has no complete checkpoint")
    dst_step = os.path.join(dst, "ckpt", step)
    if os.path.exists(dst_step):
        print(f"{dst_step} already present; leaving run dir untouched")
        return
    os.makedirs(os.path.join(dst, "ckpt"), exist_ok=True)
    shutil.copytree(os.path.join(src, "ckpt", step), dst_step)
    for sub in ("ckpt_best", "ckpt_best_deploy"):
        sub_step = _latest_ckpt_step(os.path.join(src, sub))
        if sub_step is not None and not os.path.exists(
            os.path.join(dst, sub, sub_step)
        ):
            os.makedirs(os.path.join(dst, sub), exist_ok=True)
            shutil.copytree(
                os.path.join(src, sub, sub_step),
                os.path.join(dst, sub, sub_step),
            )
    for path in glob.glob(os.path.join(src, "*")):
        base = os.path.basename(path)
        if base in ("PACK.json", "ckpt", "ckpt_best", "ckpt_best_deploy"):
            continue
        if not os.path.exists(os.path.join(dst, base)):
            shutil.copy2(path, os.path.join(dst, base))
    print(f"restored {run} at {step} -> {dst}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["save", "restore"])
    ap.add_argument("run", nargs="?", help="run directory name (prefix sans trailing _)")
    ap.add_argument("--all", action="store_true", help="restore every packed run")
    args = ap.parse_args(argv)
    if args.mode == "save":
        if not args.run:
            sys.exit("save requires a run name")
        save(args.run)
    else:
        runs = (
            sorted(os.listdir(PACKS))
            if args.all
            else [args.run]
            if args.run
            else sys.exit("restore requires a run name or --all")
        )
        for run in runs:
            if os.path.isdir(os.path.join(PACKS, run)):
                restore(run)


if __name__ == "__main__":
    main()
