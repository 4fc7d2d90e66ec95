"""Minimal repro for the remote-TPU worker crash on long CG scans.

Observed (round 3, ROADMAP.md "Larger-mesh story"): at finest-row problem
sizes (~3.3k vertices / ~27k velocity dofs) a single jitted program that
scans >=100 IPCS-CG steps (each step = two fixed-iteration PCG solves, i.e.
a scan-of-scans) reliably KILLS the remote TPU worker — the device call
never returns, the worker process dies, and NEW JAX clients hang in
jax.devices() until the service recycles, while already-initialized clients
keep computing.  10-step warmup scans are fine; 25-step chunks run the full
5000-step solve (drag/lift correct vs the f64 CPU oracle).  Smaller meshes
(~1.7k verts) run 100-step scans fine.

This script reduces the trigger to SYNTHETIC operators (no mesh, no FEM):
a banded SPD matrix of the same shape/bandwidth as the finest-row velocity
system, scanned PCG steps of the same nesting structure.  Bisect axes:

    python scripts/cg_crash_repro.py --n 29768 --band 408 --iters 15 \
        --steps 100            # crashes the worker (round-3 observation)
    python scripts/cg_crash_repro.py --steps 25   # completes

WARNING: a successful repro WEDGES fresh TPU clients (jax.devices() hangs)
for other processes started afterwards until the tunnel service recycles.
Run it only when nothing else needs to open a new TPU client — e.g. at the
end of a round, after pausing trainers (their already-open clients survive,
but their watchdog RESTARTS would hang).

Findings log (run on v5e via the axon tunnel):
    see docs/CG_SCAN_CRASH.md
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=29768, help="system size (dofs)")
    ap.add_argument("--band", type=int, default=408, help="half bandwidth")
    ap.add_argument("--iters", type=int, default=15, help="PCG iters per step")
    ap.add_argument("--iters2", type=int, default=12, help="second solve iters")
    ap.add_argument("--steps", type=int, default=100, help="outer scan length")
    ap.add_argument("--nest", choices=["scan2", "flat"], default="scan2",
                    help="scan-of-scans (production shape) or flattened")
    ap.add_argument("--two-solves", action="store_true", default=True)
    ap.add_argument("--one-solve", dest="two_solves", action="store_false")
    args = ap.parse_args(argv)

    import numpy as np
    import scipy.sparse as sp

    import meshdqn_tpu  # noqa: F401  (matmul precision, compile cache)
    import jax
    import jax.numpy as jnp
    from meshdqn_tpu.ops.banded import BandedMatrix
    from meshdqn_tpu.ops.cg import pcg

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    n, w = args.n, args.band
    # Banded SPD matrix with the finest-row footprint.
    diags, offs = [], []
    for k in range(0, w + 1, max(1, w // 24)):  # ~25 stored diagonals
        if k == 0:
            diags.append(3.0 + rng.random(n))
        else:
            off = 0.1 * rng.random(n - k) / (1 + k / 50)
            diags += [off, off]
            offs += [-k, k]
    A = sp.diags(diags, [0] + offs).tocsr()
    Ab = BandedMatrix.from_scipy(A, dtype=jnp.float32)
    dinv = jnp.asarray(1.0 / A.diagonal(), dtype=jnp.float32)
    print(f"operator: n={n} band={w} blocks={Ab.blocks.shape} "
          f"({Ab.nbytes / 1e6:.0f} MB)", flush=True)

    it1, it2 = args.iters, args.iters2

    def step(carry, _):
        x, b = carry
        x = pcg(Ab, dinv, b[:, None], x[:, None], it1)[:, 0]
        if args.two_solves:
            x = pcg(Ab, dinv, x[:, None], x[:, None], it2)[:, 0]
        b = x * 0.999 + 1e-3  # keep values bounded, state flowing
        return (x, b), x[0]

    @jax.jit
    def run(x0, b0):
        if args.nest == "scan2":
            (x, b), tr = jax.lax.scan(step, (x0, b0), None, length=args.steps)
        else:
            x, b = x0, b0
            tr = []
            for _ in range(args.steps):
                (x, b), t = step((x, b), None)
                tr.append(t)
            tr = jnp.stack(tr)
        return x, tr

    x0 = jnp.zeros(n, jnp.float32)
    b0 = jnp.ones(n, jnp.float32)
    print(f"compiling+running {args.steps}-step {args.nest} "
          f"({it1}{'+' + str(it2) if args.two_solves else ''} iters/step)...",
          flush=True)
    t0 = time.time()
    x, tr = run(x0, b0)
    v = float(x[0])
    print(f"OK: {time.time() - t0:.1f}s, x[0]={v:.3e}, finite="
          f"{bool(jnp.isfinite(x).all())}", flush=True)


if __name__ == "__main__":
    main()
