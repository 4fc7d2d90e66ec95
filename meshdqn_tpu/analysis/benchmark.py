"""Benchmark figures + resolution-sweep tooling.

Full-parity re-implementation of reference training_results/
analyze_benchmark.py:23-645 — the paper-style "mesh improvement" figures:

* resolution-sweep scatter (drag or lift vs vertex count, coarse-mesh
  screen at 1200 vertices, outlier screen at 1.5 sigma for the noisier
  airfoils — :38-45);
* converged-value horizontal line from the fine-mesh rows (:70-72);
* deployed refinement path (re-simulated, red) and interpolated path
  (green) from the `{obj}_drag_trajectory.npy` /
  `{obj}_interpolate_drag_trajectory.npy` artifacts (:96-100);
* original (pentagon) and refined (star) airfoil markers (:101-108);
* a zoomed inset around the trajectory with +-threshold dashed lines
  (:110-165, bounds auto-computed from the data instead of hard-coded);
* the initial/final drag & lift error printout (:215-226);
* a lift variant of the whole figure (:226-450).

Consumes a sweep CSV with columns NUM_COORDS,RESOLUTION,TIME,DRAG,LIFT —
either the reference's shipped benchmark_results/*.csv or our own generated
sweep (scripts/resolution_sweep.py).
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


def _load_traj(deployed_dir: str, obj: str):
    traj_path = os.path.join(deployed_dir, f"{obj}_drag_trajectory.npy")
    est_path = os.path.join(deployed_dir, f"{obj}_interpolate_drag_trajectory.npy")
    traj = np.load(traj_path, allow_pickle=True) if os.path.exists(traj_path) else None
    est = np.load(est_path, allow_pickle=True) if os.path.exists(est_path) else None
    return traj, est


def _columns(arr: np.ndarray, quantity: str, snapshot_index: int):
    """(vertices, values) for 'drag' or 'lift' from a trajectory artifact
    with columns [verts, drags(S)..., lifts(S)...]."""
    S = (arr.shape[1] - 1) // 2
    idx = S + snapshot_index if snapshot_index < 0 else snapshot_index
    col = 1 + idx + (S if quantity == "lift" else 0)
    return arr[:, 0].astype(float), arr[:, col].astype(float)


def improvement_figure(
    sweep_csv: str,
    deployed_dir: str,
    obj: str,
    quantity: str = "drag",
    out: str | None = None,
    snapshot_index: int = -1,
    threshold: float = 1e-3,
    coarse_screen: int = 1200,
    converged_screen: int = 1500,
    sigma_screen: float | None = None,
    show_interpolation: bool = True,
):
    """The paper-style mesh-improvement figure for one airfoil/quantity.

    Returns the error-printout stats dict (also printed, matching
    analyze_benchmark.py:215-226).
    """
    assert quantity in ("drag", "lift")
    qcol = quantity.upper()
    data = load_sweep(sweep_csv)
    if sigma_screen is not None:
        med, std = data[qcol].median(), data[qcol].std()
        data = data[np.abs(data[qcol]) < sigma_screen * std + np.abs(med)]
    fine = data[data["NUM_COORDS"] > converged_screen]
    converged = float(
        np.abs(fine[qcol].values[0]) if len(fine) else np.abs(data[qcol]).iloc[0]
    )
    coarse = data[data["NUM_COORDS"] < coarse_screen]

    traj, est = _load_traj(deployed_dir, obj)

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    from mpl_toolkits.axes_grid1.inset_locator import mark_inset, zoomed_inset_axes

    fig, ax = plt.subplots(figsize=(10, 8))
    ax.scatter(
        coarse["NUM_COORDS"],
        coarse[qcol].abs(),
        marker="s",
        edgecolor="k",
        lw=2,
        s=90,
        color="steelblue",
        label="Computed Airfoils",
    )
    ax.axhline(converged, color="#888888", lw=2, ls="--", label="Converged Value")

    stats = {}
    v0 = d0 = None
    if traj is not None and len(traj):
        v, d = _columns(traj, quantity, snapshot_index)
        ax.plot(v, np.abs(d), color="r", lw=1.5, zorder=-1, label="Refinement Path")
        ax.scatter(
            v[-1], abs(d[-1]), marker="*", s=220, color="goldenrod",
            edgecolor="k", lw=1.5, label="Refined Airfoil",
        )
        ax.scatter(
            v[0], abs(d[0]), marker="p", s=200, color="magenta",
            edgecolor="k", lw=2, label="Original Airfoil",
        )
        v0, d0 = v[0], d[0]
        # error printout for BOTH quantities (reference prints both blocks)
        for q in ("drag", "lift"):
            _, vals = _columns(traj, q, snapshot_index)
            stats[f"initial_{q}"] = float(vals[0])
            stats[f"final_{q}"] = float(vals[-1])
            stats[f"{q}_error_pct"] = (
                100.0 * abs(vals[0] - vals[-1]) / abs(vals[0])
            )
        stats["initial_vertices"] = int(v[0])
        stats["final_vertices"] = int(v[-1])
        stats["vertices_removed"] = int(v[0] - v[-1])
        stats["vertices_pct"] = 100.0 * (1.0 - v[-1] / v[0])
    ev = ed = None
    if show_interpolation and est is not None and len(est):
        ev, ed = _columns(est, quantity, snapshot_index)
        keep = np.isfinite(ed)
        ax.plot(
            ev[keep], np.abs(ed[keep]), color="g", lw=1.5, zorder=-1,
            label="Interpolation Path",
        )

    # ---- zoomed inset around the trajectory ---------------------------
    if v0 is not None:
        axins = zoomed_inset_axes(ax, zoom=6, loc="upper right")
        for spine in axins.spines.values():
            spine.set_linewidth(2)
        axins.scatter(
            coarse["NUM_COORDS"], coarse[qcol].abs(), marker="s",
            edgecolor="k", lw=2, s=90, color="steelblue",
        )
        axins.axhline(converged, color="#888888", lw=2, ls="--")
        axins.axhline(abs(d0), color="orchid", lw=2, ls="--", zorder=-1)
        if show_interpolation:
            axins.axhline((1 + threshold) * abs(d0), color="#aaaaaa", lw=2, ls="--")
            axins.axhline((1 - threshold) * abs(d0), color="#aaaaaa", lw=2, ls="--")
        v, d = _columns(traj, quantity, snapshot_index)
        axins.plot(v, np.abs(d), color="r", lw=1.5, zorder=-1)
        if show_interpolation and ev is not None:
            keep = np.isfinite(ed)
            axins.plot(ev[keep], np.abs(ed[keep]), color="g", lw=1.5, zorder=-1)
        axins.scatter(v[-1], abs(d[-1]), marker="*", s=220, color="goldenrod",
                      edgecolor="k", lw=1.5)
        axins.scatter(v[0], abs(d[0]), marker="p", s=200, color="magenta",
                      edgecolor="k", lw=2)
        lo_v, hi_v = v.min(), v.max()
        pad_v = max(6.0, 0.15 * (hi_v - lo_v))
        vals = np.abs(d[np.isfinite(d)])
        lo_d, hi_d = vals.min(), vals.max()
        pad_d = max(3 * threshold * abs(d0), 0.3 * (hi_d - lo_d))
        axins.set_xlim(lo_v - pad_v, hi_v + pad_v)
        axins.set_ylim(lo_d - pad_d, hi_d + pad_d)
        axins.yaxis.get_major_locator().set_params(nbins=7)
        axins.xaxis.get_major_locator().set_params(nbins=7)
        axins.tick_params(labelsize=9)
        mark_inset(ax, axins, loc1=2, loc2=4, fc="none", ec="0.2", lw=2)

    ax.set_xlabel("Number of Vertices", fontsize=20)
    ax.set_ylabel(quantity.capitalize(), fontsize=20)
    ax.set_title(
        f"{obj.split('_')[0].upper()} Mesh Improvement ({quantity.capitalize()})",
        fontsize=24,
        y=1.01,
    )
    handles, labels = ax.get_legend_handles_labels()
    ax.legend(handles, labels, fontsize=13, ncol=3, loc="lower right")

    out = out or os.path.join(deployed_dir, f"{obj}_{quantity}_improvement.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)

    if stats:
        for q in ("drag", "lift"):
            print(f"INITIAL {q.upper()}:\t{stats[f'initial_{q}']:.8f}")
            print(f"FINAL {q.upper()}:\t{stats[f'final_{q}']:.8f}")
            print(f"{q.upper()} ERROR:\t{stats[f'{q}_error_pct']:.5f}%")
        print(f"INITIAL VERTICES:\t{stats['initial_vertices']}")
        print(f"FINAL VERTICES:\t\t{stats['final_vertices']}")
        print(f"VERTICES REMOVED:\t{stats['vertices_removed']}")
        print(f"VERTICES PERCENT:\t{stats['vertices_pct']:.3f}%")
    return stats


def benchmark_figure(
    sweep_csv: str,
    deployed_dir: str,
    obj: str,
    out: str | None = None,
    snapshot_index: int = -1,
):
    """Back-compat simple figure + stats (round-1 API): drag vs vertex count
    with both deployed trajectories."""
    stats = improvement_figure(
        sweep_csv,
        deployed_dir,
        obj,
        quantity="drag",
        out=out or os.path.join(deployed_dir, f"{obj}_benchmark.png"),
        snapshot_index=snapshot_index,
    )
    return stats


def sweep_overlay_figure(
    gen_csv: str,
    ref_csv: str,
    quantity: str = "drag",
    out: str | None = None,
    title: str | None = None,
):
    """Overlay OUR generated resolution sweep on the reference's CSV rows.

    The reference's de-facto regression table is its benchmark_results CSVs
    (analyze_benchmark.py:25-33); this figure shows the framework's own
    mesh-generation + solver pipeline reproducing the same drag/lift vs
    vertex-count trend from geometry alone.  Returns a stats dict with the
    median relative deviation of the generated rows from the reference
    trend (linear interpolation in vertex count over the shared range).
    """
    assert quantity in ("drag", "lift")
    qcol = quantity.upper()
    gen = load_sweep(gen_csv).dropna(subset=[qcol]).sort_values("NUM_COORDS")
    ref = load_sweep(ref_csv).dropna(subset=[qcol]).sort_values("NUM_COORDS")
    # The reference CSVs contain DIVERGED coarse-mesh rows (e.g.
    # smooth_ah93w145…csv:37-38, drag ~3e7) alongside the NaN rows; any
    # physically plausible force here is O(0.1), so drop |q| > 1 before
    # fitting the trend (the reference's own figures hide these rows via
    # zoomed axes, analyze_benchmark.py:226+).
    gen = gen[gen[qcol].abs() < 1.0]
    ref = ref[ref[qcol].abs() < 1.0]

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 8))
    ax.scatter(
        ref["NUM_COORDS"], ref[qcol].abs(), marker="s", s=70,
        color="steelblue", edgecolor="k", lw=1.5, label="Reference sweep (FEniCS)",
    )
    ax.scatter(
        gen["NUM_COORDS"], gen[qcol].abs(), marker="o", s=80,
        color="darkorange", edgecolor="k", lw=1.5,
        label="Generated sweep (this framework)",
    )
    ax.set_xlabel("Number of Vertices", fontsize=20)
    ax.set_ylabel(quantity.capitalize(), fontsize=20)
    if title:
        ax.set_title(title, fontsize=22, y=1.01)
    ax.legend(fontsize=13, loc="lower right")

    # Trend agreement over the overlapping vertex range.
    lo = max(gen["NUM_COORDS"].min(), ref["NUM_COORDS"].min())
    hi = min(gen["NUM_COORDS"].max(), ref["NUM_COORDS"].max())
    inside = gen[(gen["NUM_COORDS"] >= lo) & (gen["NUM_COORDS"] <= hi)]
    stats = {"n_gen": int(len(gen)), "n_ref": int(len(ref))}
    if len(inside) and len(ref) >= 2:
        interp = np.interp(
            inside["NUM_COORDS"].values,
            ref["NUM_COORDS"].values,
            ref[qcol].abs().values,
        )
        rel = np.abs(inside[qcol].abs().values - interp) / np.abs(interp)
        stats["median_rel_dev"] = float(np.median(rel))
        stats["max_rel_dev"] = float(np.max(rel))
        ax.plot(
            ref["NUM_COORDS"], ref[qcol].abs(), color="steelblue", lw=1,
            alpha=0.5, zorder=-1,
        )

    if out:
        fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return stats
