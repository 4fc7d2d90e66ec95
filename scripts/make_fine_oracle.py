#!/usr/bin/env python
"""f64 oracle rows for the finest generated meshes (+ f32-TPU cross-check).

Runs the full 5000-step IPCS solve in float64 on CPU — the highest-accuracy
solver configuration in the repo — on an explicit committed mesh FILE, and
appends a self-describing row (vertex count + mesh file sha256 prefix) to
docs/examples/gen_finest_f64cg_oracle.csv.  This is the regression anchor the
reference provides via its converged benchmark CSVs
(/root/reference/training_results/benchmark_results/smooth_ys930_*.csv:2,
drag -0.11306 at 3395 verts).

Why the CSV carries mesh identity now: the round-2 oracle rows (drag
-0.1112 on a 3286-vert ys930 mesh) were computed BEFORE the mesh generator's
verbatim-ring change (git 9c852c1) and the r4 regeneration of
docs/examples/meshes/*_gen.xdmf (3796 verts) — same nominal file name,
different geometry.  The ~1.8% drag split between the oracle CSV and
gen_ys930_benchmark_r4.csv was mesh geometry, not solver error; rows keyed
only by nominal resolution could not show that.  See
docs/FINE_ORACLE_RECONCILIATION.md.

Usage:
  python scripts/make_fine_oracle.py --airfoil ys930            # f64 CPU row
  python scripts/make_fine_oracle.py --airfoil ys930 --tpu-f32  # f32 TPU row
  python scripts/make_fine_oracle.py --airfoil ys930 --mesh path/to.xdmf
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_CSV = "docs/examples/gen_finest_f64cg_oracle.csv"
HEADER = "AIRFOIL,NUM_COORDS,RESOLUTION,TIME,DRAG,LIFT,SOLVER,MESH_SHA8\n"
DEFAULT_MESH = "docs/examples/meshes/{air}_0.05000_gen.xdmf"


def mesh_sha8(path: str) -> str:
    # Hash the H5 payload (coordinates + cells), not the XDMF wrapper.
    h5 = os.path.splitext(path)[0] + ".h5"
    target = h5 if os.path.exists(h5) else path
    return hashlib.sha256(open(target, "rb").read()).hexdigest()[:8]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--airfoil", required=True, choices=["ys930", "ah93w145"])
    ap.add_argument("--mesh", default=None, help="mesh XDMF (default: the "
                    "committed finest generated mesh)")
    ap.add_argument("--resolution", type=float, default=0.05)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument(
        "--tpu-f32", action="store_true",
        help="run the production f32 TPU CG path instead of the f64 CPU "
        "oracle (for same-mesh cross-checks)",
    )
    ap.add_argument("--out", default=OUT_CSV)
    args = ap.parse_args(argv)

    import jax

    if not args.tpu_f32:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import meshdqn_tpu  # noqa: F401  (precision policy)
    from meshdqn_tpu.mesh import read_xdmf
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    mesh_path = args.mesh or DEFAULT_MESH.format(air=args.airfoil)
    mesh = read_xdmf(mesh_path)
    sha8 = mesh_sha8(mesh_path)
    backend = jax.default_backend()
    if args.tpu_f32:
        solver_tag = f"f32-cg-{backend}"
        cfg = IPCSConfig(
            precision="f32", fused=False, method="cg", cg_chunk=25,
            cg_iters_u=6, cg_iters_m=5, cg_precond="block",
            cg_block_size=128, invert_on_device=backend == "tpu",
        )
    else:
        solver_tag = f"f64-cg-{backend}"
        # cg_layout='ell' on CPU: the banded dense-block layout is a TPU
        # layout (VPU multiply-reduce at HBM bandwidth); on CPU its fill
        # costs ~9x the CSR/ELL flops (measured r5: 2.5 h CPU vs the r2
        # ELL oracle's ~1000 s at comparable size).
        cfg = IPCSConfig(precision="f64", method="cg", cg_layout="ell")
    print(
        f"{args.airfoil}: {mesh.num_vertices} verts from {mesh_path} "
        f"(sha8={sha8}), solver={solver_tag}",
        flush=True,
    )
    t0 = time.time()
    solver = IPCSSolver(mesh, cfg)
    sol = solver.solve(args.steps, save_steps=1000)
    wall = time.time() - t0
    drag = float(np.asarray(sol["snap_drags"])[-1])
    lift = float(np.asarray(sol["snap_lifts"])[-1])
    row = (
        f"{args.airfoil},{mesh.num_vertices},{args.resolution:.5f},"
        f"{wall:.1f},{drag:.7f},{lift:.7f},{solver_tag},{sha8}\n"
    )
    print(row.strip(), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    exists = os.path.exists(args.out)
    if exists:
        first = open(args.out).readline()
        if "MESH_SHA8" not in first:
            # Migrate the legacy (round-2) header in place: old rows carry
            # no mesh identity — mark them explicitly as the pre-9c852c1
            # geometry so they cannot be confused with current-mesh rows.
            lines = open(args.out).read().splitlines()
            with open(args.out, "w") as f:
                f.write(HEADER)
                for ln in lines[1:]:
                    if ln.strip():
                        f.write(ln + ",pre-9c852c1\n")
    with open(args.out, "a") as f:
        if not exists:
            f.write(HEADER)
        f.write(row)
    np.savez(
        f"artifacts/fine_oracle_{args.airfoil}_{solver_tag}.npz",
        snap_drags=np.asarray(sol["snap_drags"]),
        snap_lifts=np.asarray(sol["snap_lifts"]),
        mesh_sha8=sha8,
        mesh_path=mesh_path,
    )


if __name__ == "__main__":
    main()
