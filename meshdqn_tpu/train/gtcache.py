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
    reuse_any_precision: bool = False,
) -> GroundTruth:
    """Return the run's ground truth, loading the cache when its fingerprint
    matches and (re)writing both the npz and the sidecar otherwise — the npz
    and fingerprint on disk always correspond.

    reuse_any_precision: accept a cached GT whose fingerprint differs ONLY
    in solver precision (without touching the sidecar).  Deployment uses
    this: the training ground truth is the policy's reference frame and
    must be reused even when re-simulation runs at a different precision —
    recomputing would also clobber the training run's cache."""
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
        if reuse_any_precision and cached_meta is not None:
            strip = lambda m: {
                k: v
                for k, v in m.items()
                if k not in ("precision", "refine_iters")
            }
            if strip(cached_meta) == strip(fingerprint):
                print(
                    "reusing cached ground truth computed at precision "
                    f"{cached_meta.get('precision')!r} (deploy precision "
                    f"{fingerprint.get('precision')!r} affects only "
                    "re-simulation)"
                )
                return GroundTruth.load(gt_path)
        print("ground_truth.npz fingerprint mismatch; recomputing")

    if ground_truth is None:
        ground_truth = compute_ground_truth(config)
    ground_truth.save(gt_path)
    with open(meta_path, "w") as f:
        json.dump(fingerprint, f)
    return ground_truth
