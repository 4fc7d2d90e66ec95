"""Training-run status summary.

    python -m meshdqn_tpu.cli.status [--runs training_results] [run ...]

One line per run directory: episodes, global steps, recent throughput,
reward moving averages, epsilon, and checkpoint freshness — the quick
"is it learning / is it alive" view the reference only gets by opening
the analysis plots (README.md:26-28).  Reads only artifacts on disk; safe
to run against live runs.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def _tail_jsonl(path: str, max_bytes: int = 512_000) -> list[dict]:
    try:
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            f.seek(max(0, size - max_bytes))
            chunk = f.read().decode("utf-8", "replace")
    except OSError:
        return []
    out = []
    for line in chunk.splitlines()[1 if size > max_bytes else 0 :]:
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return out


def run_status(run_dir: str) -> dict | None:
    log = os.path.join(run_dir, "train_log.jsonl")
    events = [e for e in _tail_jsonl(log) if e.get("event") == "episode"]
    if not events:
        return None
    last = events[-1]
    status = {
        "run": os.path.basename(run_dir),
        "episode": last.get("episode"),
        "global_step": last.get("global_step"),
        "eps": round(float(last.get("eps", float("nan"))), 4),
        "last_event_age_s": round(time.time() - float(last["ts"]), 1),
    }
    # Throughput over the tail window.
    if len(events) >= 2:
        dt = float(last["ts"]) - float(events[0]["ts"])
        dsteps = int(last["global_step"]) - int(events[0]["global_step"])
        if dt > 0 and dsteps > 0:
            status["env_steps_per_s"] = round(dsteps / dt, 2)
            status["ms_per_env_step"] = round(1000.0 * dt / dsteps, 1)
    # Reward moving averages from the episode events in the tail.
    rewards = [float(e["reward"]) for e in events]
    for w in (100, 1000):
        if len(rewards) >= w:
            status[f"reward_ma{w}"] = round(sum(rewards[-w:]) / w, 3)
    status["reward_last"] = round(rewards[-1], 3)
    # Pause state: a PAUSE request or PAUSED ack holds the run loop; show
    # its age so a stuck pause (dead pauser) is visible at a glance.
    for name in ("PAUSED", "PAUSE"):
        p = os.path.join(run_dir, name)
        if os.path.exists(p):
            status["paused"] = name
            status["paused_age_s"] = round(time.time() - os.path.getmtime(p), 1)
            break
    # Checkpoint freshness.
    ckpt = os.path.join(run_dir, "ckpt")
    if os.path.isdir(ckpt):
        steps = [
            int(n.split("_", 1)[1])
            for n in os.listdir(ckpt)
            if n.startswith("step_")
            and os.path.exists(os.path.join(ckpt, n, "extras.json"))
        ]
        if steps:
            status["ckpt_step"] = max(steps)
    return status


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="*", help="run dirs (default: all under --runs-dir)")
    ap.add_argument("--runs-dir", default="training_results")
    args = ap.parse_args(argv)
    dirs = args.runs or sorted(
        os.path.join(args.runs_dir, d)
        for d in (os.listdir(args.runs_dir) if os.path.isdir(args.runs_dir) else [])
        if os.path.isdir(os.path.join(args.runs_dir, d))
    )
    for d in dirs:
        st = run_status(d)
        if st is not None:
            print(json.dumps(st))


if __name__ == "__main__":
    main()
