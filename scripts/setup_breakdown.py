"""Break down the warm fused-setup cost: densify vs invert vs refine vs ship.

Also measures host->device bandwidth through the tunnel, to size up an
operator-cache (ship composed f32 operators instead of recomposing).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MESH = "/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.fem.assembly import apply_bc_symmetric, assemble_operators
    from meshdqn_tpu.mesh import read_xdmf, smooth
    from meshdqn_tpu.mesh.marking import mark_boundaries
    from meshdqn_tpu.solver.fused import _coo64, _dense64, _refined_solve

    print(f"backend={jax.default_backend()}", flush=True)

    # --- tunnel bandwidth ------------------------------------------------
    for mb in (16, 64):
        x = np.random.rand(mb * 1024 * 1024 // 4).astype(np.float32)
        t0 = time.time()
        d = jax.device_put(x)
        np.asarray(d[:8])  # fence
        dt = time.time() - t0
        print(f"device_put {mb} MB: {dt:.2f}s ({mb/dt:.0f} MB/s)", flush=True)
        t0 = time.time()
        _ = np.asarray(d)
        dt = time.time() - t0
        print(f"readback  {mb} MB: {dt:.2f}s ({mb/dt:.0f} MB/s)", flush=True)

    mesh = smooth(read_xdmf(MESH), 50)
    markers = mark_boundaries(mesh)
    ops = assemble_operators(mesh, markers, 1e-3, 1.0, 5e-4)
    A1bc = apply_bc_symmetric(ops.A1, ops.u_bc_mask)
    n1 = A1bc.shape[0]
    print(f"n1={n1} nnz={A1bc.nnz}", flush=True)

    coo = _coo64(A1bc)

    # densify alone
    f = jax.jit(lambda c: _dense64(c, (n1, n1)))
    A64 = f(coo); np.asarray(A64[:2, :2])
    t0 = time.time(); A64 = f(coo); np.asarray(A64[:2, :2])
    print(f"dense64 scatter ({A1bc.nnz} nnz -> {n1}^2 f64): {time.time()-t0:.2f}s", flush=True)

    # f32 inverse alone
    g = jax.jit(lambda A: jnp.linalg.inv(A.astype(jnp.float32)))
    Ai = g(A64); np.asarray(Ai[:2, :2])
    t0 = time.time(); Ai = g(A64); np.asarray(Ai[:2, :2])
    print(f"f32 inv {n1}x{n1}: {time.time()-t0:.2f}s", flush=True)

    # one refined solve, full B width as in _compose_sys1
    ncols = 2 * n1 + ops.Q.ndofs + 1
    B = jnp.zeros((n1, ncols), jnp.float64)
    h = jax.jit(lambda A, B: _refined_solve(A, B, 3))
    X = h(A64, B); np.asarray(X[:2, :2])
    t0 = time.time(); X = h(A64, B); np.asarray(X[:2, :2])
    print(f"refined_solve iters=3 B=({n1},{ncols}): {time.time()-t0:.2f}s", flush=True)
    h2 = jax.jit(lambda A, B: _refined_solve(A, B, 2))
    X = h2(A64, B); np.asarray(X[:2, :2])
    t0 = time.time(); X = h2(A64, B); np.asarray(X[:2, :2])
    print(f"refined_solve iters=2: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
