"""Accuracy gate for the large-mesh CG path on real hardware.

Runs the f32 CG solver (IPCSConfig(method='cg')) on a saved generated mesh
and compares the 5000-step drag/lift against the f64 CG oracle computed on
CPU for the same mesh (artifacts/fine_oracle_<airfoil>.npz) — the same
oracle-vs-fast-path protocol as the stock-mesh gates (tests/test_solver.py),
at the reference benchmark's finest-row scale (smooth_*_benchmark.csv:2).

Usage:
    python scripts/cg_gate.py --airfoil ys930 [--steps 5000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--airfoil", default="ys930")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--save-steps", type=int, default=1000)
    args = ap.parse_args(argv)

    import jax

    import meshdqn_tpu  # noqa: F401  (matmul precision config)
    from meshdqn_tpu.mesh import read_xdmf
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    mesh_path = (
        f"artifacts/benchmark_results/meshes/{args.airfoil}_0.05000_gen.xdmf"
    )
    oracle_path = f"artifacts/fine_oracle_{args.airfoil}.npz"
    mesh = read_xdmf(mesh_path)  # saved post-smoothing; do not re-smooth
    oracle = np.load(oracle_path)
    print(f"backend={jax.default_backend()} verts={mesh.num_vertices}", flush=True)

    t0 = time.time()
    solver = IPCSSolver(mesh, IPCSConfig(precision="f32", method="cg"))
    setup_s = time.time() - t0
    t0 = time.time()
    sol = solver.solve(args.steps, save_steps=args.save_steps)
    float(sol["drags"][-1])
    wall = time.time() - t0

    n = args.steps // args.save_steps
    gd, gl = oracle["snap_drags"][:n], oracle["snap_lifts"][:n]
    d, l = sol["snap_drags"][:n], sol["snap_lifts"][:n]
    rel_d = float(np.max(np.abs((d - gd) / gd)))
    rel_l = float(np.max(np.abs((l - gl) / gl)))
    print(
        json.dumps(
            {
                "airfoil": args.airfoil,
                "verts": int(mesh.num_vertices),
                "steps": args.steps,
                "setup_s": round(setup_s, 1),
                "wall_s": round(wall, 2),
                "per_step_ms": round(1e3 * wall / args.steps, 3),
                "drag": float(d[-1]),
                "lift": float(l[-1]),
                "max_snap_rel_err_drag_vs_f64": rel_d,
                "max_snap_rel_err_lift_vs_f64": rel_l,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
