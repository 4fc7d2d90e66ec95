"""Decompose the CG-path per-step cost on the attached TPU.

Round-2 measured 306 ms/step at the finest sweep size (~3,300 verts / 27k
velocity dofs) — ~100x above the HBM roofline estimate (~130 MB of operator
traffic per step).  This probe times each building block of
solver/ipcs.ipcs_step_cg in isolation so the pathology can be located:

  * ELL matvec on A1bc (the 25x-repeated PCG kernel)
  * one 25-iteration PCG solve
  * dense pressure inverse matvec
  * convection assembly (gather + segment_sum scatter)
  * one full ipcs_step_cg
  * a 25-step evolve chunk (the production unit)

Every timing loop is a bounded lax.scan (<= the known-safe 25-step chunk
work volume) with a host readback fence.  Run while nothing else needs a
fresh TPU client (ROADMAP.md crash note).

Usage: python scripts/cg_microbench.py [--resolution 0.05] [--airfoil ys930]
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


def fence(x):
    import numpy as np

    return float(np.asarray(x).ravel()[0])


def timeit(fn, *args, reps=3):
    """Best-of-reps wall time of fn(*args) with readback fences."""
    walls = []
    out = fn(*args)
    fence(out)  # compile + warm
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        fence(out)
        walls.append(time.time() - t0)
    return min(walls)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--airfoil", default="ys930", choices=sorted(STOCK))
    ap.add_argument("--resolution", type=float, default=0.05)
    ap.add_argument("--stock", action="store_true", help="use the stock mesh")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from functools import partial

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.mesh import airfoil_polyline, read_xdmf, smooth
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver
    from meshdqn_tpu.solver.ipcs import evolve_cg_n, ipcs_step_cg
    from meshdqn_tpu.ops.cg import ell_matmat, pcg

    print(f"backend={jax.default_backend()}", flush=True)
    if args.stock:
        mesh = smooth(read_xdmf(STOCK[args.airfoil]), 50)
    else:
        from meshdqn_tpu.mesh.generate import generate_channel_mesh

        ring = airfoil_polyline(read_xdmf(STOCK[args.airfoil]))
        t0 = time.time()
        mesh = smooth(generate_channel_mesh(ring, args.resolution), 50)
        print(f"mesh gen: {time.time() - t0:.1f}s", flush=True)
    print(f"mesh: {mesh.num_vertices} verts", flush=True)

    t0 = time.time()
    solver = IPCSSolver(mesh, IPCSConfig(precision="f32", method="cg"))
    print(f"setup {time.time() - t0:.1f}s", flush=True)
    dev = solver.dev
    n_u = solver.ndofs_u
    n_p = solver.ndofs_p
    K1 = dev.A1bc.vals.shape[1]
    K3 = dev.A3bc_s.vals.shape[1]
    mb1 = dev.A1bc.vals.size * 4 / 1e6
    print(
        f"dofs: u {n_u}, p {n_p}; A1 ELL ({dev.A1bc.vals.shape[0]}x{K1},"
        f" {mb1:.1f} MB f32), A3 ELL K={K3}", flush=True,
    )

    x = jnp.ones(n_u, jnp.float32) * 1e-3
    xp = jnp.ones(n_p, jnp.float32) * 1e-3

    # --- chained ELL matvecs (25 per scan ~ one PCG's matvec volume) -----
    @jax.jit
    def chain_mv(A_cols, A_vals, x0):
        def body(v, _):
            v = ell_matmat(A_cols, A_vals, v)
            return v * 1e-3, None

        v, _ = jax.lax.scan(body, x0, None, length=25)
        return v

    w = timeit(chain_mv, dev.A1bc.cols, dev.A1bc.vals, x[:, None])
    print(f"A1 ELL matvec:        {w / 25 * 1e3:8.3f} ms  (25-chain {w * 1e3:.1f} ms)", flush=True)

    # --- one PCG solve (25 iters) on A1 ----------------------------------
    b = x[:, None]
    w = timeit(partial(pcg, iters=25), dev.A1bc, dev.d1inv, b, 0.0 * b)
    print(f"PCG(A1, 25 iters):    {w * 1e3:8.1f} ms", flush=True)

    # --- dual-RHS PCG on A3 (20 iters) ------------------------------------
    ns = dev.A3bc_s.shape[0]
    B3 = jnp.stack([x[:ns], x[ns:]], axis=1)
    w = timeit(partial(pcg, iters=20), dev.A3bc_s, dev.d3inv, B3, 0.0 * B3)
    print(f"PCG(A3, 20 iters x2): {w * 1e3:8.1f} ms", flush=True)

    # --- dense pressure matvec --------------------------------------------
    @jax.jit
    def dense_mv(Ai, p0):
        def body(v, _):
            return (Ai @ v) * 1e-3, None

        v, _ = jax.lax.scan(body, p0, None, length=25)
        return v

    w = timeit(dense_mv, dev.A2inv, xp)
    print(f"A2inv dense matvec:   {w / 25 * 1e3:8.3f} ms", flush=True)

    # --- convection assembly ----------------------------------------------
    @jax.jit
    def conv_chain(kern, u0):
        def body(v, _):
            return kern(v) * 1e-3, None

        v, _ = jax.lax.scan(body, u0, None, length=25)
        return v

    w = timeit(conv_chain, dev.conv, x)
    print(f"convection assemble:  {w / 25 * 1e3:8.3f} ms", flush=True)

    # --- one full step ------------------------------------------------------
    state = solver.initial_state()

    @jax.jit
    def one_step(dev, st, us):
        st, us, dl = ipcs_step_cg(dev, st, us, 25, 20, 1)
        return dl[0]

    w = timeit(one_step, dev, state, jnp.zeros_like(x))
    print(f"ipcs_step_cg (1):     {w * 1e3:8.1f} ms", flush=True)

    # --- 25-step chunk (production unit) ----------------------------------
    def chunk25():
        st, us, dl = evolve_cg_n(dev, state, jnp.zeros_like(x), 25, 25, 20, 1)
        return dl[0]

    w = timeit(chunk25)
    print(f"evolve chunk 25:      {w * 1e3:8.1f} ms  ({w / 25 * 1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
