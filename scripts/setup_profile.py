"""Profile the f32 fused-solver setup phases on the attached backend.

bench.py reports `setup_s` = everything before step 1: mesh smooth, host
assembly, and the three on-device compose modules (solver/fused.py).  This
script times each phase separately with host-readback fences so the warm
(compile-cached) setup cost can be attributed and attacked.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MESH = "/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf"


def fence(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    for x in leaves:
        if hasattr(x, "addressable_data"):
            __import__("numpy").asarray(x)  # host readback = reliable fence
    return tree


def main():
    import jax

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.fem.assembly import assemble_operators
    from meshdqn_tpu.mesh import read_xdmf, smooth
    from meshdqn_tpu.mesh.marking import mark_boundaries
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    print(f"backend={jax.default_backend()}", flush=True)

    t0 = time.time()
    mesh = smooth(read_xdmf(MESH), 50)
    t_mesh = time.time() - t0
    print(f"mesh read+smooth: {t_mesh:.2f}s", flush=True)

    t0 = time.time()
    markers = mark_boundaries(mesh)
    ops = assemble_operators(mesh, markers, 1e-3, 1.0, 5e-4)
    t_asm = time.time() - t0
    print(f"host assembly: {t_asm:.2f}s", flush=True)

    # Full solver init (includes a second assembly — acceptable here).
    t0 = time.time()
    solver = IPCSSolver(mesh, IPCSConfig(precision="f32"))
    fence(solver.dev._replace(conv=None))
    t_init = time.time() - t0
    print(f"IPCSSolver init total (fenced): {t_init:.2f}s", flush=True)

    # Now time the compose modules alone, reusing the already-shipped COO:
    # second build with everything warm (compile cache + host assembly).
    t0 = time.time()
    solver2 = IPCSSolver(mesh, IPCSConfig(precision="f32"))
    fence(solver2.dev._replace(conv=None))
    print(f"second init (all warm): {time.time() - t0:.2f}s", flush=True)

    # First-step compile + execute.
    t0 = time.time()
    st, d, _ = solver.evolve(solver.initial_state(), 10)
    print(f"10-step evolve (warm compile): {time.time() - t0:.2f}s "
          f"drag[-1]={float(d[-1]):.6f}", flush=True)


if __name__ == "__main__":
    main()
