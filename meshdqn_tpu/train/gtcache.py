"""Ground-truth cache with a fingerprint sidecar.

The reference persists flow snapshots as loose ``snapshots/*.npy`` files and
reloads them on RESTART with no validation (Env2DAirfoil.py:126-153).  Here
the ground truth lives in one ``ground_truth.npz`` next to the run artifacts,
guarded by a JSON fingerprint of every config field that affects it — so a
changed mesh/precision/schedule under the same prefix recomputes instead of
silently training (or deploying) on stale physics.
"""
from __future__ import annotations

import json
import os

from ..env import GroundTruth, compute_ground_truth
from ..utils import Config


def gt_fingerprint(config: Config) -> dict:
    """Every config field the ground-truth solve depends on."""
    fp = {
        "mesh": config.flow.mesh,
        "mu": config.flow.mu,
        "rho": config.flow.rho,
        "dt": config.flow.dt,
        "smooth": config.flow.smooth,
        "solver_steps": config.agent.solver_steps,
        "save_steps": config.agent.save_steps,
        "precision": config.flow.precision,
    }
    if config.flow.precision == "mixed":
        fp["refine_iters"] = config.flow.refine_iters
    return fp


def load_or_compute_ground_truth(
    config: Config,
    run_dir: str,
    ground_truth: GroundTruth | None = None,
) -> GroundTruth:
    """Return the run's ground truth, loading the cache when its fingerprint
    matches and (re)writing both the npz and the sidecar otherwise — the npz
    and fingerprint on disk always correspond."""
    os.makedirs(run_dir, exist_ok=True)
    gt_path = os.path.join(run_dir, "ground_truth.npz")
    meta_path = os.path.join(run_dir, "ground_truth_meta.json")
    fingerprint = gt_fingerprint(config)

    if ground_truth is None and os.path.exists(gt_path):
        cached_meta = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                cached_meta = json.load(f)
        if cached_meta == fingerprint:
            return GroundTruth.load(gt_path)
        print("ground_truth.npz fingerprint mismatch; recomputing")

    if ground_truth is None:
        ground_truth = compute_ground_truth(config)
    ground_truth.save(gt_path)
    with open(meta_path, "w") as f:
        json.dump(fingerprint, f)
    return ground_truth
