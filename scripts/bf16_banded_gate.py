#!/usr/bin/env python
"""Accuracy gate for bf16 banded-block storage on the large-mesh CG path.

VERDICT r4 weak #3: bf16 blocks measured 0.232 ms/matvec vs 0.330 f32 at
the finest sweep row but sat unpromoted with "accuracy margin unproven".
This runs the FULL 5000-step finest-row solve with f32 vs bf16 banded
operators (production CG settings: block-Jacobi (6,5), chunked scans) and
decides: promote iff |drag_bf16 - drag_f32| / |drag_f32| < 1e-3 and the
same for lift.  Writes docs/examples/bf16_banded_gate.json.

Usage: python scripts/bf16_banded_gate.py [--airfoil ys930] [--steps 5000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(mesh, steps, dtype_tag):
    import numpy as np

    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    cfg = IPCSConfig(
        precision="f32",
        fused=False,
        method="cg",
        cg_chunk=25,
        cg_iters_u=6,
        cg_iters_m=5,
        cg_precond="block",
        cg_block_size=128,
        cg_banded_dtype=dtype_tag,
        invert_on_device=True,
    )
    t0 = time.time()
    solver = IPCSSolver(mesh, cfg)
    setup_s = time.time() - t0
    # Warm the evolve program on a few steps so the timed section is
    # compile-free (the remote backend's block_until_ready does not block;
    # solve()'s snapshot readbacks are the fence).
    solver.solve(25, save_steps=25)
    t0 = time.time()
    out = solver.solve(steps, save_steps=steps // 5)
    wall = time.time() - t0
    return {
        "dtype": dtype_tag,
        "setup_s": round(setup_s, 2),
        "wall_s": round(wall, 2),
        "ms_per_step": round(1000.0 * wall / steps, 3),
        "drag": float(np.asarray(out["snap_drags"])[-1]),
        "lift": float(np.asarray(out["snap_lifts"])[-1]),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--airfoil", default="ys930", choices=["ys930", "ah93w145"])
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--out", default="docs/examples/bf16_banded_gate.json")
    args = ap.parse_args(argv)

    import meshdqn_tpu  # noqa: F401

    from meshdqn_tpu.mesh import read_xdmf, smooth

    mesh = smooth(
        read_xdmf(f"docs/examples/meshes/{args.airfoil}_0.05000_gen.xdmf"), 50
    )
    print(f"{args.airfoil} finest mesh: {mesh.num_vertices} verts", flush=True)
    rows = []
    for tag in ("f32", "bf16"):
        r = run(mesh, args.steps, tag)
        rows.append(r)
        print(r, flush=True)
    f32, bf16 = rows
    drag_rel = abs(bf16["drag"] - f32["drag"]) / abs(f32["drag"])
    lift_rel = abs(bf16["lift"] - f32["lift"]) / abs(f32["lift"])
    promote = drag_rel < 1e-3 and lift_rel < 1e-3
    verdict = {
        "airfoil": args.airfoil,
        "vertices": int(mesh.num_vertices),
        "steps": args.steps,
        "f32": f32,
        "bf16": bf16,
        "drag_rel_err_bf16_vs_f32": float(drag_rel),
        "lift_rel_err_bf16_vs_f32": float(lift_rel),
        "gate_rel_threshold": 1e-3,
        "speedup": round(f32["ms_per_step"] / bf16["ms_per_step"], 3),
        "promote": bool(promote),
    }
    print(json.dumps(verdict, indent=1), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    existing = {}
    if os.path.exists(args.out):
        existing = json.load(open(args.out))
    existing[args.airfoil] = verdict
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)


if __name__ == "__main__":
    main()
