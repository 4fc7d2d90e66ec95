"""Benchmark figures + resolution-sweep tooling.

Covers reference training_results/analyze_benchmark.py:23-645: drag/lift vs
vertex count against the mesh-resolution-sweep scatter, with the deployed
interpolated + re-simulated trajectories overlaid, and the final error
printout (:215-226).  Consumes:

* a sweep CSV with columns NUM_COORDS,RESOLUTION,TIME,DRAG,LIFT (the
  reference ships these under training_results/benchmark_results/; ours are
  produced by `run_resolution_sweep` below over a list of meshes);
* the deployed `{obj}_drag_trajectory.npy` /
  `{obj}_interpolate_drag_trajectory.npy` artifacts (layouts identical to
  deploy_dqn.py:392-417).
"""
from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd


def load_sweep(csv_path: str) -> pd.DataFrame:
    return pd.read_csv(csv_path)


def run_resolution_sweep(mesh_paths: list[str], config, out_csv: str):
    """Full transient solve per mesh -> CSV rows NUM_COORDS,RESOLUTION,TIME,
    DRAG,LIFT.  RESOLUTION is parsed from filenames of the reference's form
    `<name>_<resolution>_triangle.xdmf` when possible, else NaN."""
    import re

    from ..mesh import read_xdmf, smooth
    from ..solver import IPCSConfig, IPCSSolver

    rows = []
    for path in mesh_paths:
        mesh = read_xdmf(path)
        if config.flow.smooth:
            mesh = smooth(mesh, 50)
        solver = IPCSSolver(
            mesh,
            IPCSConfig(
                mu=config.flow.mu,
                rho=config.flow.rho,
                dt=config.flow.dt,
                precision=config.flow.precision,
                refine_iters=config.flow.refine_iters,
            ),
        )
        t0 = time.time()
        out = solver.solve(config.agent.solver_steps, save_steps=config.agent.save_steps)
        float(out["drags"][-1])
        wall = time.time() - t0
        m = re.search(r"_([0-9.]+)_triangle", os.path.basename(path))
        res = float(m.group(1)) if m else float("nan")
        rows.append(
            {
                "NUM_COORDS": mesh.num_vertices,
                "RESOLUTION": f"{res:.5f}" if np.isfinite(res) else "nan",
                "TIME": wall,
                "DRAG": float(out["snap_drags"][-1]),
                "LIFT": float(out["snap_lifts"][-1]),
            }
        )
        pd.DataFrame(rows).to_csv(out_csv, index=False)
    return pd.DataFrame(rows)


def benchmark_figure(
    sweep_csv: str,
    deployed_dir: str,
    obj: str,
    out: str | None = None,
    snapshot_index: int = -1,
):
    """Drag vs vertex count: sweep scatter + deployed trajectories
    (analyze_benchmark.py:78-200)."""
    data = load_sweep(sweep_csv)

    traj_path = os.path.join(deployed_dir, f"{obj}_drag_trajectory.npy")
    est_path = os.path.join(deployed_dir, f"{obj}_interpolate_drag_trajectory.npy")
    traj = np.load(traj_path, allow_pickle=True) if os.path.exists(traj_path) else None
    est = np.load(est_path, allow_pickle=True) if os.path.exists(est_path) else None

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    ax.scatter(
        data["NUM_COORDS"], data["DRAG"], s=14, color="#888888",
        label="resolution sweep (full solve)",
    )
    stats = {}
    if traj is not None and len(traj):
        # columns: [verts, drags(S)..., lifts(S)...]
        S = (traj.shape[1] - 1) // 2
        v = traj[:, 0].astype(float)
        d = traj[:, 1 + (S + snapshot_index if snapshot_index < 0 else snapshot_index)]
        ax.plot(v, d, "o-", color="tab:red", label="deployed (re-simulated)")
        stats.update(
            initial_drag=float(d[0]),
            final_drag=float(d[-1]),
            drag_error_pct=100 * abs(d[-1] - d[0]) / abs(d[0]),
            vertices_removed=int(v[0] - v[-1]),
        )
    if est is not None and len(est):
        S = (est.shape[1] - 1) // 2
        v = est[:, 0].astype(float)
        d = est[:, 1 + (S + snapshot_index if snapshot_index < 0 else snapshot_index)]
        ax.plot(v, d, "x--", color="tab:blue", label="deployed (interpolated)")
    ax.set(xlabel="Number of vertices", ylabel="Drag",
           title=f"{obj}: drag vs mesh size")
    ax.legend()
    out = out or os.path.join(deployed_dir, f"{obj}_benchmark.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)

    if stats:
        print(f"INITIAL DRAG: {stats['initial_drag']:.7f}")
        print(f"FINAL DRAG:   {stats['final_drag']:.7f}")
        print(f"DRAG ERROR:   {stats['drag_error_pct']:.5f}%")
        print(f"VERTICES REMOVED: {stats['vertices_removed']}")
    return stats
