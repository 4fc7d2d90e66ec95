"""Pallas TPU kernels.

The hot path of the fused solver is dense matmuls, which XLA already maps
onto the MXU at roofline — hand-writing those would be re-scheduling what
the compiler does well.  Pallas earns its keep where XLA's lowering is weak:
the irregular gather of the ELL SpMV used by the unfused/mixed solver paths
(and by any future larger-mesh configuration where densified operators no
longer fit HBM).

Design: FEM dof vectors are tiny relative to VMEM (2Ns ~ 6.6k floats =
26 KB of the ~16 MB budget), so the whole input vector is pinned in VMEM
and the (rows, K) ELL blocks stream through the grid; each grid step
computes a row-block of y = sum_k vals[r, k] * x[cols[r, k]] entirely
on-chip.  No HBM gather traffic at all — cols/vals are read once,
sequentially.

Kernels run in interpreter mode on CPU for tests; on TPU they compile with
the Mosaic pipeline.  `ell_matvec_pallas` is behind an opt-in flag
(ops.sparse.EllMatrix defaults to the XLA formulation until the kernel is
profiled on real hardware).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _ell_kernel(x_ref, cols_ref, vals_ref, out_ref):
    """One row-block: y = sum_k vals * x[cols].

    Mosaic supports 2-D gathers only, so the VMEM-resident vector is
    broadcast across the row block and indexed with take_along_axis."""
    # NOTE: on-hardware Mosaic lowering of this gather is blocked in the
    # current jax version (its gather rule only supports full-width
    # take_along_axis shapes, and jnp indexing canonicalizes indices to i64
    # under x64).  The kernel is validated in interpreter mode and kept as
    # the reference implementation; ops/sparse.py's XLA formulation is the
    # production path (see ROADMAP).
    x = x_ref[:]  # (n,) full vector in VMEM
    cols = cols_ref[:]  # (bR, K)
    vals = vals_ref[:]  # (bR, K)
    out_ref[:] = jnp.sum(vals * x[cols], axis=1)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def ell_matvec_pallas(
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    x: jnp.ndarray,
    block_rows: int = 512,
    interpret: bool = False,
):
    """y[r] = sum_k vals[r, k] * x[cols[r, k]] as a Pallas kernel.

    cols/vals: (R, K) with zero padding; x: (n,).
    """
    R, K = cols.shape
    nblocks = pl.cdiv(R, block_rows)
    pad = nblocks * block_rows - R
    if pad:
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
        vals = jnp.pad(vals, ((0, pad), (0, 0)))

    kwargs = {}
    if not interpret and _VMEM is not None:
        in_specs = [
            pl.BlockSpec(memory_space=_VMEM),  # x, whole vector
            pl.BlockSpec((block_rows, K), lambda i: (i, 0), memory_space=_VMEM),
            pl.BlockSpec((block_rows, K), lambda i: (i, 0), memory_space=_VMEM),
        ]
        out_specs = pl.BlockSpec((block_rows,), lambda i: (i,), memory_space=_VMEM)
    else:
        in_specs = [
            pl.BlockSpec(memory_space=None),
            pl.BlockSpec((block_rows, K), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, K), lambda i: (i, 0)),
        ]
        out_specs = pl.BlockSpec((block_rows,), lambda i: (i,))

    y = pl.pallas_call(
        _ell_kernel,
        out_shape=jax.ShapeDtypeStruct((nblocks * block_rows,), vals.dtype),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        **kwargs,
    )(x, cols, vals)
    return y[:R]
