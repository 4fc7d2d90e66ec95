#!/usr/bin/env python
"""Phase breakdown of the large-mesh CG-path setup (VERDICT r4 weak #4:
18.5 s setup against a 31 s finest-row solve; sweep pays it per row).

Times: mesh smooth, assembly, BC elimination, RCM + permutations, banded
packing (per operator), preconditioner build, pressure dense inverse, and
first-solve compile — on the finest generated ys930 mesh with production
CG settings.

Usage: python scripts/cg_setup_breakdown.py [--mesh PATH]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--mesh", default="docs/examples/meshes/ys930_0.05000_gen.xdmf"
    )
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args(argv)

    import numpy as np

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.mesh import read_xdmf, smooth
    from meshdqn_tpu.ops import banded as banded_mod
    from meshdqn_tpu.ops import cg as cg_mod
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    times: dict[str, float] = {}

    def wrap(mod, name):
        orig = getattr(mod, name)

        def timed(*a, **k):
            t0 = time.time()
            out = orig(*a, **k)
            times[name] = times.get(name, 0.0) + (time.time() - t0)
            return out

        setattr(mod, name, timed)
        return orig

    orig_band = wrap(banded_mod.BandedMatrix, "from_scipy")
    orig_rcm = wrap(banded_mod, "rcm_permutation")
    orig_bji = wrap(cg_mod, "block_jacobi_inv")

    cfg = IPCSConfig(
        precision="f32", fused=False, method="cg", cg_chunk=25,
        cg_iters_u=6, cg_iters_m=5, cg_precond="block", cg_block_size=128,
        invert_on_device=True,
    )
    for trial in range(args.trials):
        times.clear()
        t0 = time.time()
        mesh = smooth(read_xdmf(args.mesh), 50)
        t_mesh = time.time() - t0
        t0 = time.time()
        solver = IPCSSolver(mesh, cfg)
        t_setup = time.time() - t0
        t0 = time.time()
        out = solver.solve(25, save_steps=25)
        d = float(np.asarray(out["snap_drags"])[-1])
        t_first = time.time() - t0
        t0 = time.time()
        out = solver.solve(25, save_steps=25)
        t_warm = time.time() - t0
        print(
            f"trial {trial}: mesh {t_mesh:.1f}s setup {t_setup:.1f}s "
            f"(tracked: {', '.join(f'{k} {v:.1f}s' for k, v in times.items())}) "
            f"first-25-solve {t_first:.1f}s warm-25 {t_warm:.1f}s drag {d:.6f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
