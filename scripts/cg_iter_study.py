"""CG iteration-count study: accuracy vs (cg_iters_u, cg_iters_m).

The CG path's step cost is linear in the PCG iteration counts (ops/cg.py);
the defaults (25, 20) were chosen conservatively.  This sweeps lower counts
on the stock ys930 mesh in f64 against the dense-f64 oracle to find the
knee — fewer iterations speed the large sweep rows proportionally.

Run on CPU (f64): python scripts/cg_iter_study.py [steps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FORCE cpu — the axon sitecustomize initializes jax at interpreter start,
# so env vars set here are too late (docs/AXON.md); config.update works.
# Long CG scans at size are known to kill the remote TPU worker.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

MESH = "/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf"


def main():
    import numpy as np

    from meshdqn_tpu.mesh import read_xdmf, smooth
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    mesh = smooth(read_xdmf(MESH), 50)

    t0 = time.time()
    oracle = IPCSSolver(mesh, IPCSConfig(precision="f64"))
    st, d_ref, l_ref = oracle.evolve(oracle.initial_state(), steps)
    d_ref, l_ref = float(d_ref[-1]), float(l_ref[-1])
    print(f"dense-f64 oracle: drag {d_ref:+.7f} lift {l_ref:+.7f} "
          f"({time.time()-t0:.0f}s)")

    for iu, im in [(25, 20), (18, 14), (12, 10), (8, 6), (6, 5), (4, 3)]:
        cfg = IPCSConfig(precision="f64", method="cg",
                         cg_iters_u=iu, cg_iters_m=im)
        s = IPCSSolver(mesh, cfg)
        t0 = time.time()
        st, d, l = s.evolve(s.initial_state(), steps)
        d, l = float(d[-1]), float(l[-1])
        dt = time.time() - t0
        print(f"cg({iu:2d},{im:2d}): drag {d:+.7f} (rel {abs(d-d_ref)/abs(d_ref):.2e}) "
              f"lift {l:+.7f} (rel {abs(l-l_ref)/abs(l_ref):.2e})  {dt:.0f}s")


if __name__ == "__main__":
    main()
