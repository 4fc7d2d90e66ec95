#!/usr/bin/env python
"""Assemble a machine-readable deployment report from deployed/ artifacts.

The reference's deliverable is deploy_dqn.py's final verified error printout
(deploy_dqn.py:496-517) plus the per-removal re-simulated trajectory
(complete_traj, :262-269, 376-387).  This tool reduces those artifacts to
one JSON section per deployment mode:

  * removals: vertices removed along the greedy/use_best rollout
  * per_step_resim_drag_err_pct: final-snapshot drag error of the FULL
    5000-step re-simulation after each removal, % vs ground truth
  * verified_removals_within_threshold: removals whose re-simulated drag
    stays inside the reference's 0.1% episode threshold
    (configs/*.yaml threshold=0.001)

Usage:
  python scripts/deploy_report.py --run training_results/ah93w145_results \
      --label greedy --out docs/examples/ah93w145_r4_deploy_report.json \
      [--note "..."] [--meta k=v ...]

Repeated invocations with different --label merge sections into one file.
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def build_section(run_dir: str, threshold: float = 1e-3, note: str = ""):
    dep = os.path.join(run_dir, "deployed")
    trajs = sorted(glob.glob(os.path.join(dep, "*_drag_trajectory.npy")))
    trajs = [t for t in trajs if "interpolate" not in os.path.basename(t)]
    if not trajs:
        raise SystemExit(f"no complete-trajectory artifact under {dep}")
    # A --restart resumed deployment re-prefixes its artifacts restart_
    # (deploy_dqn.py:113-124 semantics); the resumed file supersedes the
    # original, so pick the trajectory with the most completed rows
    # (tiebreak: newest).
    traj_path = max(
        trajs, key=lambda t: (np.load(t).shape[0], os.path.getmtime(t))
    )
    traj = np.load(traj_path)  # (rows, 1 + S + S): vertices, drags, lifts
    n_s = (traj.shape[1] - 1) // 2
    vertices = traj[:, 0].astype(int)
    drags = traj[:, 1 : 1 + n_s]
    lifts = traj[:, 1 + n_s :]
    gt = np.load(os.path.join(run_dir, "ground_truth.npz"))
    gt_drag = float(np.asarray(gt["gt_drag"])[-1])
    gt_lift = float(np.asarray(gt["gt_lift"])[-1])

    err_pct = 100.0 * np.abs(drags[:, -1] - gt_drag) / abs(gt_drag)
    lift_err_pct = 100.0 * np.abs(lifts[:, -1] - gt_lift) / abs(gt_lift)
    removals = len(vertices) - 1  # row 0 is the uncoarsened ground truth
    thr_pct = 100.0 * threshold
    verified = int(np.sum(err_pct[1:] <= thr_pct))
    section = {
        "note": note
        or "full greedy deployment; EVERY removal re-simulated "
        "(complete_traj, 5000 steps each)",
        "removals": removals,
        "initial_vertices": int(vertices[0]),
        "final_vertices": int(vertices[-1]),
        "vertices_pct_removed": round(
            100.0 * (1 - vertices[-1] / vertices[0]), 3
        ),
        "per_step_resim_drag_err_pct": [round(float(e), 4) for e in err_pct],
        "max_resim_drag_err_pct": round(float(err_pct.max()), 4),
        "final_drag_error_pct": round(float(err_pct[-1]), 4),
        "final_lift_error_pct": round(float(lift_err_pct[-1]), 4),
        "threshold_pct": thr_pct,
        "verified_removals_within_threshold": verified,
        "all_within_threshold": bool(np.all(err_pct[1:] <= thr_pct)),
    }
    cu = os.path.join(dep, "checkpoint_used.json")
    if os.path.exists(cu):
        section["checkpoint_used"] = json.load(open(cu))
    # Deployer-written run summary (terminal reason, --verified stats,
    # goal-floor status) — newest wins across restarts.
    summaries = glob.glob(os.path.join(dep, "*_deploy_summary.json"))
    if summaries:
        s = json.load(open(max(summaries, key=os.path.getmtime)))
        for k in (
            "terminal_reason", "verified", "rejections", "interp_overrides",
            "goal_vertices_floor", "reached_goal_floor", "final_sim_s",
        ):
            if k in s:
                section[k] = s[k]
    return section


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", required=True)
    ap.add_argument("--label", default="greedy")
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=1e-3)
    ap.add_argument("--note", default="")
    ap.add_argument("--meta", nargs="*", default=[], help="k=v top-level")
    args = ap.parse_args(argv)

    section = build_section(args.run, args.threshold, args.note)
    report = {}
    if os.path.exists(args.out):
        report = json.load(open(args.out))
    for kv in args.meta:
        k, _, v = kv.partition("=")
        try:
            report[k] = json.loads(v)
        except json.JSONDecodeError:
            report[k] = v
    report.setdefault("airfoil", os.path.basename(args.run).split("_")[0])
    report[args.label] = section
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(
        f"{args.label}: {section['removals']} removals, "
        f"{section['verified_removals_within_threshold']} verified within "
        f"{section['threshold_pct']}%, max err "
        f"{section['max_resim_drag_err_pct']}% -> {args.out}"
    )


if __name__ == "__main__":
    main()
