"""Generate a mesh-resolution sweep and benchmark it with one batched solve.

Reproduces the reference's benchmark_results CSV workflow (SURVEY.md §6) with
this framework's own tools end-to-end:

1. decimate the stock ys930 mesh to several vertex budgets using the
   coarsening pipeline (random interior removals, seeded);
2. write the variants as XDMF (mesh/xdmf.py);
3. solve ALL of them simultaneously with the batched fused solver
   (solver/batch.py) — one vmapped program instead of one solve per row;
4. emit a benchmark CSV in the reference's NUM_COORDS,RESOLUTION,TIME,DRAG,
   LIFT layout (TIME = per-flow share of the batched wall-clock).

Usage:  python scripts/make_sweep.py [--targets 850 800 750] [--steps 5000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshdqn_tpu.coarsen import RemovalStatus, remove_vertex
from meshdqn_tpu.mesh import read_xdmf, smooth, write_xdmf
from meshdqn_tpu.solver import IPCSConfig
from meshdqn_tpu.solver.batch import BatchedFlows


def decimate(mesh, target_vertices: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    while mesh.num_vertices > target_vertices:
        removable = np.flatnonzero(~mesh.boundary_vertex_mask)
        v = int(rng.choice(removable))
        res = remove_vertex(mesh, v)
        if res.status == RemovalStatus.OK:
            mesh = res.mesh
    return mesh


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf")
    ap.add_argument("--targets", type=int, nargs="+", default=[850, 820, 790, 760])
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--out-dir", default="artifacts/sweep")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    base = smooth(read_xdmf(args.mesh), 50)
    meshes = [base]
    names = [f"ys930_{base.num_vertices}"]
    for t in args.targets:
        m = smooth(decimate(base, t, seed=t), 50)
        meshes.append(m)
        names.append(f"ys930_{m.num_vertices}")
        write_xdmf(os.path.join(args.out_dir, names[-1] + "_triangle.xdmf"), m)
        print(f"decimated -> {m.num_vertices} vertices", flush=True)

    batched = BatchedFlows(meshes, IPCSConfig(precision="f32", fused=True))
    print("batched operators built", flush=True)
    # warm compile
    st, d, _ = batched.evolve(batched.initial_state(), 100)
    float(d[0, -1])
    t0 = time.time()
    out = batched.solve(args.steps, save_steps=min(1000, args.steps))
    float(out["drags"][0, -1])
    wall = time.time() - t0
    per_flow = wall / len(meshes)

    import pandas as pd

    rows = []
    for i, (m, name) in enumerate(zip(meshes, names)):
        rows.append(
            {
                "NUM_COORDS": m.num_vertices,
                "RESOLUTION": "0.15000",
                "TIME": per_flow,
                "DRAG": float(out["snap_drags"][i, -1]),
                "LIFT": float(out["snap_lifts"][i, -1]),
            }
        )
    df = pd.DataFrame(rows)
    csv_path = os.path.join(args.out_dir, "ys930_decimation_benchmark.csv")
    df.to_csv(csv_path, index=False)
    print(df.to_string(index=False))
    print(f"batched wall for {len(meshes)} flows x {args.steps} steps: {wall:.1f}s "
          f"({per_flow:.1f}s/flow)")
    print("csv:", csv_path)


if __name__ == "__main__":
    main()
