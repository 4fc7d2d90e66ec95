"""On-hardware A/B of the banded SpMV: XLA windowed form vs Pallas kernel.

The Pallas kernel (ops/pallas_kernels.banded_matmat_pallas_aligned) pins the
padded x in VMEM and streams the dense row-blocks once, so its HBM traffic
is exactly the blocks; the XLA form (ops/banded.banded_matmat) materializes
the (B, W) window array in HBM every matvec.  Both are numerically
identical (tests/test_banded.py); this probe decides whether the kernel
earns the production default (MESHDQN_BANDED_PALLAS).

Run with the trainers PAUSED — the chip is shared.

Usage: python scripts/banded_pallas_probe.py [--airfoil ys930]
       [--resolution 0.05] [--reps 50]
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


def timeit(fn, *a, reps=5):
    out = fn(*a)
    _ = [float(x.ravel()[0]) for x in (out if isinstance(out, tuple) else (out,))]
    walls = []
    for _i in range(reps):
        t0 = time.time()
        out = fn(*a)
        _ = [float(x.ravel()[0]) for x in (out if isinstance(out, tuple) else (out,))]
        walls.append(time.time() - t0)
    return min(walls)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--airfoil", default="ys930", choices=sorted(STOCK))
    ap.add_argument("--resolution", type=float, default=0.05)
    ap.add_argument("--stock", action="store_true")
    ap.add_argument("--chain", type=int, default=25, help="matvecs per timed call")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.mesh import airfoil_polyline, read_xdmf, smooth
    from meshdqn_tpu.mesh.generate import generate_channel_mesh
    from meshdqn_tpu.ops import banded as bd

    print(f"backend={jax.default_backend()}", flush=True)
    if args.stock:
        mesh = smooth(read_xdmf(STOCK[args.airfoil]), 50)
    else:
        ring = airfoil_polyline(read_xdmf(STOCK[args.airfoil]))
        mesh = smooth(generate_channel_mesh(ring, args.resolution), 50)
    print(f"mesh: {mesh.num_vertices} verts", flush=True)

    # Build the CG solver's A1 operator in both banded layouts.
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    t0 = time.time()
    solver = IPCSSolver(mesh, IPCSConfig(precision="f32", method="cg"))
    print(f"setup {time.time() - t0:.1f}s", flush=True)
    dev = solver.dev
    A1 = dev.A1bc
    kind = type(A1).__name__
    print(f"A1 operator: {kind}", flush=True)
    if not isinstance(A1, bd.BandedMatrix):
        print("A1 is not banded on this backend; nothing to probe", flush=True)
        return
    B, R, W = A1.blocks.shape
    mb = A1.nbytes / 1e6
    print(f"A1 banded: blocks ({B},{R},{W}) = {mb:.1f} MB, g={A1.g}", flush=True)

    n = A1.shape[1]
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)

    # The layout (and dispatch) is fixed at solver build by
    # MESHDQN_BANDED_PALLAS; run this probe once per setting for the A/B.
    chain = args.chain

    def chain_mv(M):
        @jax.jit
        def f(x0):
            def body(v, _):
                return M.matmat(v[:, None])[:, 0] * 1e-3, None

            v, _ = jax.lax.scan(body, x0, None, length=chain)
            return v

        return f

    label = "Pallas" if A1.aligned128 else "XLA   "
    w = timeit(chain_mv(A1), x)
    print(
        f"{label} banded matvec: {w / chain * 1e3:8.3f} ms "
        f"({mb / (w / chain) / 1e3:.0f} GB/s on blocks)",
        flush=True,
    )

    # End-to-end: a 125-step evolve chunk (the production CG scan unit).
    st = solver.initial_state()
    t0 = time.time()
    _st, d, _l = solver.evolve(st, 125)
    float(d[-1])
    print(f"evolve(125) incl compile: {time.time() - t0:.1f}s", flush=True)
    walls = []
    for _ in range(3):
        t0 = time.time()
        _st, d, _l = solver.evolve(st, 125)
        float(d[-1])
        walls.append(time.time() - t0)
    w = min(walls)
    print(
        f"{label} evolve 125 steps: {w:6.2f} s  ({w / 125 * 1e3:.1f} ms/step)",
        flush=True,
    )


if __name__ == "__main__":
    main()
