"""Drag/lift vs inflow amplitude from ONE ensemble solve.

Runs B inflow amplitudes of the ys930 flow simultaneously on shared fused
operators (solver/ensemble.py) and plots the final drag/lift against the
amplitude (equivalently the Reynolds number Re = s * Um * L / nu).  The
whole B-member sweep costs barely more than one flow; the reference would
run B separate FEniCS solves.

Usage: python scripts/reynolds_ensemble.py [--B 16] [--steps 5000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshdqn_tpu.mesh import read_xdmf, smooth
from meshdqn_tpu.solver import IPCSConfig
from meshdqn_tpu.solver.ensemble import EnsembleFlows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf")
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--out", default="docs/examples/ys930_reynolds_ensemble.png")
    args = ap.parse_args(argv)

    mesh = smooth(read_xdmf(args.mesh), 50)
    # amplitudes above ~1.4 exceed the explicit-convection CFL limit at
    # dt=1e-3 and diverge (the reference scheme has the same constraint).
    amps = np.linspace(0.4, 1.3, args.B)
    ens = EnsembleFlows(mesh, list(amps), IPCSConfig(precision="f32", fused=True))
    st = ens.initial_state()
    t0 = time.time()
    st, drags, lifts = ens.evolve(st, args.steps)
    final_d = np.asarray(drags[:, -1])
    wall = time.time() - t0
    final_l = np.asarray(lifts[:, -1])
    print(f"{args.B} flows x {args.steps} steps in {wall:.1f}s "
          f"({wall / args.B:.2f}s effective per flow)")
    for a, d, l in zip(amps, final_d, final_l):
        print(f"  amp {a:4.2f} (Re ~{1000 * a:4.0f}): drag {d:+.6f}  lift {l:+.6f}")

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.plot(1000 * amps, final_d, "o-", label="drag")
    ax.plot(1000 * amps, final_l, "s-", label="lift")
    ax.set(xlabel="Reynolds number (Um L / nu)", ylabel="Force coefficient",
           title=f"ys930: {args.B}-member inflow ensemble, one batched solve")
    ax.legend()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, bbox_inches="tight")
    print("figure:", args.out)


if __name__ == "__main__":
    main()
