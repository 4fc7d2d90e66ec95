"""Break down IPCSSolver warm-start setup time on the attached backend.

The bench's `setup_s` covers mesh read+smooth, host FEM assembly, and the
fused-operator composition (three jitted on-device modules with persistent
compile cache).  This script times each phase separately so regressions can
be attributed — run it on a QUIET device (no concurrent training/sweep:
TPU programs from different processes serialize).

Usage: python scripts/profile_setup.py [--repeat 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MESH = "/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args(argv)

    import jax

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.fem.assembly import assemble_operators
    from meshdqn_tpu.mesh import read_xdmf, smooth
    from meshdqn_tpu.mesh.marking import mark_boundaries
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    print(f"backend={jax.default_backend()}", flush=True)

    for rep in range(args.repeat):
        t0 = time.time()
        mesh = smooth(read_xdmf(MESH), 50)
        t_mesh = time.time() - t0

        t0 = time.time()
        markers = mark_boundaries(mesh)
        assemble_operators(mesh, markers, 1.0, 1.0, 5e-4)
        t_asm = time.time() - t0

        # Full init repeats the assembly above; subtract it for the compose
        # share.  precision='f32' -> on-device refined composition.
        t0 = time.time()
        solver = IPCSSolver(mesh, IPCSConfig(precision="f32"))
        t_init = time.time() - t0

        # First evolve call (compile-cache hit on warm cache + execution).
        t0 = time.time()
        st, d, _ = solver.evolve(solver.initial_state(), 1000)
        float(d[-1])
        t_evolve = time.time() - t0

        print(
            f"rep {rep}: mesh {t_mesh:.1f}s | host assembly {t_asm:.1f}s | "
            f"full init {t_init:.1f}s (compose ~{t_init - t_asm:.1f}s) | "
            f"first 1000-step evolve {t_evolve:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
