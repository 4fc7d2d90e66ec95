"""Regenerate the reference's mesh-resolution benchmark sweep from geometry.

The reference's de-facto regression table is a 54-row CSV per airfoil
(training_results/benchmark_results/*.csv: NUM_COORDS,RESOLUTION,TIME,DRAG,
LIFT over resolutions 0.05-0.3, produced by an external mesh generator +
one full FEniCS solve per row, ~100-400 s each).  This script reproduces the
whole workflow with this framework's own tools:

1. meshes are GENERATED from the airfoil geometry at each resolution
   (mesh/generate.py: spline ring + graded Delaunay refinement);
2. each mesh gets the full 5000-step transient solve on the accelerator —
   fused dense operators with f64-refined composition where they fit,
   the unfused invert-once path for the largest meshes;
3. rows are appended incrementally to an output CSV in the reference layout,
   so a partial run is still useful.

Usage:
    python scripts/resolution_sweep.py --airfoil ys930 \
        [--resolutions 0.05 ... 0.3] [--steps 5000] [--out artifacts/...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STOCK = {
    "ys930": "/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf",
    "ah93w145": "/root/reference/xdmf_files/ah93w145_0.14000_triangle.xdmf",
}

DEFAULT_RESOLUTIONS = [
    0.05, 0.055, 0.06, 0.065, 0.07, 0.075, 0.08, 0.085, 0.09, 0.095,
    0.10, 0.11, 0.12, 0.13, 0.14, 0.15, 0.16, 0.17, 0.18, 0.19, 0.20,
    0.225, 0.25, 0.275, 0.30,
]

# Above this vertex count the fused dense operators / f64 refinement
# blocks stop fitting comfortably in 16 GB HBM; switch to the sparse
# warm-started-CG path (IPCSConfig.method='cg') whose HBM footprint is
# linear in the mesh — it carries the reference's finest sweep rows
# (3395 verts, smooth_ys930_…csv:2) on a single chip.
FUSED_VERTEX_LIMIT = 1600

# Above this, the TPU backend switches to the sparse CG path with BOUNDED
# scan chunks (IPCSConfig.cg_chunk): >=100-step CG scans at finest-row
# sizes crash the remote worker, while 25-step chunks run the full 5000
# steps fine (scripts/cg_tpu_probe.py, ROADMAP.md).  Between the fused
# limit and this, the UNFUSED dense invert-once path is used (operators
# inverted on host under ON_DEVICE_LU_ROW_LIMIT).
# Round 4: lowered 2600 -> 1600 (= the fused limit).  The unfused dense
# rows ran ~12 ms/step and produced the 13 s -> 61 s sweep-TIME cliff at
# the fused->dense handoff (VERDICT r3); with the R=128 banded layout the
# block-(6,5) CG path is faster than unfused dense from ~1.7k verts up
# (6.3 ms/step at 3796 verts), so CG now starts where fused ends.
DENSE_TPU_VERTEX_LIMIT = 1600
# 125-step chunks run fine with the banded CG layout (the >=100-step scan
# crash was observed with the ELL gather layout; banded probes ran 125-step
# chunks repeatedly, scripts/cg_microbench.py round 3).
CG_TPU_CHUNK = 125


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--airfoil", default="ys930", choices=sorted(STOCK))
    ap.add_argument("--resolutions", type=float, nargs="+", default=DEFAULT_RESOLUTIONS)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--save-steps", type=int, default=1000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-meshes", action="store_true")
    ap.add_argument(
        "--pad-quantum", type=int, default=768,
        help="shape-quantize fused systems so sweep rows share compiled "
             "modules (0 = off; compile per mesh shape)",
    )
    ap.add_argument(
        "--cg-iters", type=int, nargs=2, default=None, metavar=("U", "M"),
        help="PCG iteration counts (velocity, mass) for CG rows; default "
             "= solver defaults (25, 20).  (15, 12) measured equal drag at "
             "500 steps on the finest row at 1.5x the speed",
    )
    ap.add_argument(
        "--precond", default="block", choices=["block", "jacobi"],
        help="preconditioner for TPU CG rows (default: block = round-4 "
             "block-Jacobi production setting; jacobi = round-3 behaviour, "
             "pair with --cg-iters 15 12 to reproduce r3 numbers)",
    )
    args = ap.parse_args(argv)

    import jax

    import meshdqn_tpu  # noqa: F401  (precision config)
    from meshdqn_tpu.mesh import airfoil_polyline, read_xdmf, smooth, write_xdmf
    from meshdqn_tpu.mesh.generate import generate_channel_mesh
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    out = args.out or f"artifacts/benchmark_results/gen_{args.airfoil}_benchmark.csv"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    ring = airfoil_polyline(read_xdmf(STOCK[args.airfoil]))
    backend = jax.default_backend()
    print(f"backend={backend} -> {out}", flush=True)

    wrote_header = os.path.exists(out) and os.path.getsize(out) > 0
    with open(out, "a") as f:
        if not wrote_header:
            f.write("NUM_COORDS,RESOLUTION,TIME,DRAG,LIFT\n")
        for res in sorted(args.resolutions, reverse=True):  # cheap rows first
            t_gen = time.time()
            mesh = smooth(generate_channel_mesh(ring, res), 50)
            nv = mesh.num_vertices
            fused = nv <= FUSED_VERTEX_LIMIT and backend == "tpu"
            big = nv > FUSED_VERTEX_LIMIT
            # TPU large rows: sparse CG with bounded scan chunks; mid rows:
            # unfused dense; CPU large rows: unchunked f64-CG.
            use_cg = big and (backend != "tpu" or nv > DENSE_TPU_VERTEX_LIMIT)
            cg_kw = {}
            if use_cg and backend == "tpu":
                if args.precond == "block":
                    # Round-4 production setting for TPU CG rows:
                    # block-Jacobi PCG at (6,5) — drag-equal to Jacobi
                    # (15,12) to 1.1e-5 at 1.80x the speed
                    # (scripts/block_precond_study.py).
                    cg_kw = {
                        "cg_iters_u": 6,
                        "cg_iters_m": 5,
                        "cg_precond": "block",
                        "cg_block_size": 128,
                    }
                else:
                    cg_kw = {"cg_precond": "jacobi"}
            if args.cg_iters is not None:
                cg_kw["cg_iters_u"] = args.cg_iters[0]
                cg_kw["cg_iters_m"] = args.cg_iters[1]
            if use_cg:
                print(
                    f"  CG row settings: precond={cg_kw.get('cg_precond', 'jacobi')} "
                    f"iters=({cg_kw.get('cg_iters_u', 25)}, {cg_kw.get('cg_iters_m', 20)})",
                    flush=True,
                )
            cfg = IPCSConfig(
                precision="f32" if backend == "tpu" else "f64",
                fused=fused,
                method="cg" if use_cg else "dense",
                cg_chunk=CG_TPU_CHUNK if (use_cg and backend == "tpu") else 0,
                **cg_kw,
                # The solver caps on-device LU at ON_DEVICE_LU_ROW_LIMIT
                # rows (v5e scoped-VMEM; bigger systems crashed the remote
                # worker) and composes on host above it.
                invert_on_device=backend == "tpu",
                pad_quantum=args.pad_quantum if fused else 0,
            )
            try:
                # Per-row deadline (same pattern as bench.py): a crashed
                # remote worker can HANG a device call forever, which would
                # silently stall every remaining row.  SIGALRM turns that
                # into a recorded failure instead.  Finest CG rows run
                # ~25 min; the deadline scales with the step count.
                import signal

                def _deadline(signum, frame):
                    raise TimeoutError("row deadline exceeded")

                deadline_s = int(
                    os.environ.get(
                        "SWEEP_ROW_DEADLINE_S",
                        str(max(1800, int(0.6 * args.steps))),
                    )
                )
                old = signal.signal(signal.SIGALRM, _deadline)
                signal.alarm(deadline_s)
                try:
                    solver = IPCSSolver(mesh, cfg)
                    # Warm the exact evolve module(s) the timed solve will
                    # use (same n_steps => same jit cache entry), then reset
                    # the trajectory: TIME records the solve, not the JIT —
                    # the banded-CG chunk module alone compiles for minutes
                    # per fresh mesh shape (same convention as bench.py's
                    # warm trial 0).
                    _w = solver.evolve(solver.initial_state(), args.save_steps)
                    np.asarray(_w[1])
                    t0 = time.time()
                    sol = solver.solve(args.steps, save_steps=args.save_steps)
                    drag = float(sol["snap_drags"][-1])
                    lift = float(sol["snap_lifts"][-1])
                    wall = time.time() - t0
                finally:
                    signal.alarm(0)
                    signal.signal(signal.SIGALRM, old)
            except Exception as e:  # record the failure, keep sweeping
                print(f"res {res}: FAILED {type(e).__name__}: {e}", flush=True)
                continue
            f.write(f"{nv},{res:.5f},{wall:.7f},{drag:.7f},{lift:.7f}\n")
            f.flush()
            print(
                f"res {res}: verts {nv} fused={fused} solve {wall:.1f}s "
                f"(setup {t0 - t_gen:.1f}s) drag {drag:.7f} lift {lift:.7f}",
                flush=True,
            )
            if args.save_meshes:
                mdir = os.path.join(os.path.dirname(out), "meshes")
                os.makedirs(mdir, exist_ok=True)
                write_xdmf(
                    os.path.join(mdir, f"{args.airfoil}_{res:.5f}_gen.xdmf"), mesh
                )


if __name__ == "__main__":
    main()
