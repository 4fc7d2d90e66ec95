"""Probe the f32-CG IPCS path on the attached TPU with bounded step chunks.

The first f32-CG runs on the remote v5e crashed the worker mid-scan
(ROADMAP.md: suspects were the 1000-step scan-of-scans program or the
large ELL gather stream).  This probe walks up the risk ladder explicitly:

  stage 1: tiny chunk (10 steps) on a mid-size generated mesh
  stage 2: 100-step chunks to 500 steps, drag vs the f64-CG CPU value
  stage 3: full 5000 steps in --chunk-size chunks on the finest mesh

Each device call is bounded, with a host readback fence between chunks, so
a crash can be localized to a chunk size / mesh size combination.

Usage: python scripts/cg_tpu_probe.py --airfoil ys930 --resolution 0.08 \
           [--steps 500] [--chunk 100]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STOCK = {
    "ys930": "/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf",
    "ah93w145": "/root/reference/xdmf_files/ah93w145_0.14000_triangle.xdmf",
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--airfoil", default="ys930", choices=sorted(STOCK))
    ap.add_argument("--resolution", type=float, default=0.08)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--warmup-chunk", type=int, default=10)
    args = ap.parse_args(argv)

    import jax

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.mesh import airfoil_polyline, read_xdmf, smooth
    from meshdqn_tpu.mesh.generate import generate_channel_mesh
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    print(f"backend={jax.default_backend()}", flush=True)
    ring = airfoil_polyline(read_xdmf(STOCK[args.airfoil]))
    t0 = time.time()
    mesh = smooth(generate_channel_mesh(ring, args.resolution), 50)
    print(f"mesh: {mesh.num_vertices} verts ({time.time() - t0:.1f}s)", flush=True)

    cfg = IPCSConfig(precision="f32", method="cg", invert_on_device=True)
    t0 = time.time()
    solver = IPCSSolver(mesh, cfg)
    print(f"setup {time.time() - t0:.1f}s", flush=True)

    state = solver.initial_state()
    # Stage 1: one tiny chunk — compile + execute the smallest possible
    # scan of the CG step before risking anything longer.
    t0 = time.time()
    state, d, _ = solver.evolve(state, args.warmup_chunk)
    print(
        f"stage1: {args.warmup_chunk} steps OK ({time.time() - t0:.1f}s) "
        f"drag[-1]={float(d[-1]):.7f}",
        flush=True,
    )

    # Stage 2: chunked march to --steps with a fence per chunk.
    done = args.warmup_chunk
    t_start = time.time()
    while done < args.steps:
        n = min(args.chunk, args.steps - done)
        t0 = time.time()
        state, d, l = solver.evolve(state, n)
        drag = float(d[-1])  # host readback = the only reliable fence here
        done += n
        print(
            f"steps {done}/{args.steps}: chunk {n} in {time.time() - t0:.2f}s "
            f"drag {drag:.7f} lift {float(l[-1]):.7f}",
            flush=True,
        )
    wall = time.time() - t_start
    print(
        f"DONE {args.steps} steps, {wall:.1f}s after warmup "
        f"({1e3 * wall / max(args.steps - args.warmup_chunk, 1):.2f} ms/step), "
        f"final drag {float(d[-1]):.7f} lift {float(l[-1]):.7f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
