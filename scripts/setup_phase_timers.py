"""Time each phase inside IPCSSolver f32-fused init via monkeypatching."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MESH = "/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf"


def main():
    import numpy as np

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.fem import assembly
    from meshdqn_tpu.mesh import read_xdmf, smooth
    from meshdqn_tpu.ops import convection
    from meshdqn_tpu.solver import fused as fused_mod
    from meshdqn_tpu.solver import ipcs

    times: dict[str, float] = {}

    def wrap(mod, name, label):
        orig = getattr(mod, name)

        def timed(*a, **k):
            t0 = time.time()
            out = orig(*a, **k)
            times[label] = times.get(label, 0.0) + (time.time() - t0)
            return out

        setattr(mod, name, timed)

    wrap(assembly, "assemble_operators", "assemble_operators")
    wrap(fused_mod, "_compose_sys1", "compose_sys1(dispatch)")
    wrap(fused_mod, "_compose_sys2", "compose_sys2(dispatch)")
    wrap(fused_mod, "_compose_sys3", "compose_sys3(dispatch)")
    wrap(fused_mod, "build_fused_refined", "build_fused_refined(total)")
    wrap(convection.ConvectionKernel, "build", "ConvectionKernel.build")
    wrap(ipcs, "drag_probe", "probes")
    wrap(ipcs, "lift_probe", "probes")
    wrap(ipcs, "mark_boundaries", "mark_boundaries")

    mesh = smooth(read_xdmf(MESH), 50)
    for trial in range(2):
        times.clear()
        t0 = time.time()
        solver = ipcs.IPCSSolver(mesh, ipcs.IPCSConfig(precision="f32"))
        total = time.time() - t0
        print(f"--- trial {trial}: init total {total:.2f}s")
        acc = 0.0
        for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
            print(f"  {k:32s} {v:7.2f}s")
            if not k.endswith("(total)"):
                acc += v
        print(f"  {'UNACCOUNTED':32s} {total - acc:7.2f}s")
        # fence everything
        import jax

        for x in jax.tree_util.tree_leaves(solver.dev._replace(conv=None)):
            if hasattr(x, "addressable_data"):
                np.asarray(x)
        print(f"  after full fence: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
