"""Block-Jacobi PCG study on the finest sweep row (TPU).

Question: with dense RCM-diagonal block inverses (ops/cg.BlockJacobi),
how far below the drag-equal Jacobi setting (15, 12) can the fixed PCG
iteration counts go, and what is the net ms/step?

Per-iteration cost model (finest ys930 row, ~29.8k velocity dofs):
  banded A blocks ~ n*W*4 bytes streamed per matvec;
  block inverses add n*nb*4 bytes per preconditioner application.
So halving the iteration count wins even if the preconditioner stream
costs ~25% extra per iteration.

Method: 500-step evolve per arm (chunked scans, warm-started), drag
compared to the Jacobi (15,12) baseline (round-3-validated drag-equal to
(25,20) and to the f64 oracle at this step count); warm 200-step timing
window.  Run when the chip is reasonably quiet.

Usage: python scripts/block_precond_study.py [--resolution 0.05]
           [--steps 500] [--airfoil ys930]
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
    ap.add_argument("--resolution", type=float, default=0.05)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--time-steps", type=int, default=200)
    args = ap.parse_args(argv)

    import jax

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.mesh import airfoil_polyline, read_xdmf, smooth
    from meshdqn_tpu.mesh.generate import generate_channel_mesh
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    print(f"backend={jax.default_backend()}", flush=True)
    ring = airfoil_polyline(read_xdmf(STOCK[args.airfoil]))
    mesh = smooth(generate_channel_mesh(ring, args.resolution), 50)
    print(f"mesh: {mesh.num_vertices} vertices", flush=True)

    def run(precond, nb, iu, im):
        t0 = time.time()
        s = IPCSSolver(
            mesh,
            IPCSConfig(
                precision="f32", fused=False, method="cg", cg_chunk=25,
                cg_iters_u=iu, cg_iters_m=im, invert_on_device=True,
                cg_precond=precond, cg_block_size=nb,
            ),
        )
        setup = time.time() - t0
        st, d, _ = s.evolve(s.initial_state(), args.steps)
        drag = float(d[-1])
        # warm timing window
        t0 = time.time()
        st, d, _ = s.evolve(st, args.time_steps)
        float(d[-1])
        ms = (time.time() - t0) / args.time_steps * 1000.0
        return drag, ms, setup

    base_drag, base_ms, su = run("jacobi", 0, 15, 12)
    print(
        f"jacobi (15,12): drag {base_drag:+.7f}  {base_ms:.1f} ms/step "
        f"(setup {su:.0f}s)", flush=True,
    )
    for nb in (64, 128):
        for iu, im in [(10, 8), (8, 6), (6, 5), (5, 4), (4, 3)]:
            try:
                drag, ms, su = run("block", nb, iu, im)
            except Exception as e:
                print(f"block nb={nb} ({iu},{im}): FAILED {e!r}", flush=True)
                continue
            rel = abs((drag - base_drag) / base_drag)
            ok = "OK " if rel < 1e-4 else ("?  " if rel < 1e-3 else "BAD")
            print(
                f"block nb={nb} ({iu:2d},{im:2d}): drag {drag:+.7f} "
                f"rel {rel:.1e} {ok} {ms:.1f} ms/step "
                f"({base_ms / ms:.2f}x vs jacobi; setup {su:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
