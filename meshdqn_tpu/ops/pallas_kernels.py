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


# ---------------------------------------------------------------------------
# Blocked dense matvec — the fused-IPCS hot op (flow_solver.py:362-396's
# back-solves become constant dense operators applied every step).
#
# The step is HBM-bandwidth-bound: each (2Ns)^2 f32 operator is ~174 MB/step
# of streaming at ys930 size, an order more than every vector combined.  The
# kernel pins the dof vector(s) in VMEM and streams the matrix through the
# grid in row blocks, one MXU dot per block — no padding copies, no
# intermediate HBM round-trips.
#
# `matvec_dual_pallas` applies ONE streamed matrix to a compensated
# (x_hi, x_lo) f32 pair: two MXU passes over the same VMEM-resident block,
# so the extra precision costs no extra HBM traffic — the TPU-native
# equivalent of carrying an f48 trajectory (the f32 fast path's dominant
# error is velocity-state rounding drift, see solver/ipcs.py precision
# notes).
# ---------------------------------------------------------------------------

_HIGHEST = jax.lax.Precision.HIGHEST


def _mv_kernel(m_ref, x_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        m_ref[:],
        x_ref[:],
        (((1,), (0,)), ((), ())),
        precision=_HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _mv_dual_kernel(m_ref, xhi_ref, xlo_ref, o_ref):
    m = m_ref[:]
    dims = (((1,), (0,)), ((), ()))
    hi = jax.lax.dot_general(
        m, xhi_ref[:], dims, precision=_HIGHEST,
        preferred_element_type=jnp.float32,
    )
    lo = jax.lax.dot_general(
        m, xlo_ref[:], dims, precision=_HIGHEST,
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = hi + lo


def _row_block_imap(i):
    # Under jax_enable_x64 (package-wide, for the f64 oracle paths) plain
    # int index-map returns canonicalize to i64, which Mosaic rejects at
    # lowering ("failed to legalize func.return (i32, i64)"); pin i32.
    return (jnp.asarray(i, jnp.int32), jnp.int32(0))


def _pinned_imap(i):
    # whole-array block, same for every grid step (the default index map
    # also canonicalizes to i64 under x64 — see _row_block_imap)
    z = jnp.int32(0)
    return (z, z)


def _mv_specs(block_rows, n_cols, n_rhs, interpret):
    mem = None if (interpret or _VMEM is None) else _VMEM
    kw = {} if mem is None else {"memory_space": mem}
    m_spec = pl.BlockSpec((block_rows, n_cols), _row_block_imap, **kw)
    x_spec = pl.BlockSpec((n_cols, n_rhs), _pinned_imap, **kw)
    o_spec = pl.BlockSpec((block_rows, n_rhs), _row_block_imap, **kw)
    return m_spec, x_spec, o_spec


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def matvec_pallas(
    m: jnp.ndarray,
    x: jnp.ndarray,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = m @ x with x pinned in VMEM and m streamed in row blocks.

    m: (R, N) f32; x: (N,) or (N, k) f32 (k small, e.g. the (Ns, 2)
    velocity-component stack of the IPCS correction step).
    """
    squeeze = x.ndim == 1
    x2 = x[:, None] if squeeze else x
    R, N = m.shape
    k = x2.shape[1]
    nb = pl.cdiv(R, block_rows)
    pad = nb * block_rows - R
    mp = jnp.pad(m, ((0, pad), (0, 0))) if pad else m
    m_spec, x_spec, o_spec = _mv_specs(block_rows, N, k, interpret)
    y = pl.pallas_call(
        _mv_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * block_rows, k), jnp.float32),
        grid=(nb,),
        in_specs=[m_spec, x_spec],
        out_specs=o_spec,
        interpret=interpret,
    )(mp, x2)
    y = y[:R]
    return y[:, 0] if squeeze else y


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def matvec_dual_pallas(
    m: jnp.ndarray,
    x_hi: jnp.ndarray,
    x_lo: jnp.ndarray,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = m @ x_hi + m @ x_lo, streaming m ONCE.

    The two dots reuse the same VMEM-resident matrix block, so carrying the
    compensated low word of the state costs MXU passes (free — the op is
    bandwidth-bound) instead of a second 174 MB matrix stream.
    """
    squeeze = x_hi.ndim == 1
    xh = x_hi[:, None] if squeeze else x_hi
    xl = x_lo[:, None] if squeeze else x_lo
    R, N = m.shape
    k = xh.shape[1]
    nb = pl.cdiv(R, block_rows)
    pad = nb * block_rows - R
    mp = jnp.pad(m, ((0, pad), (0, 0))) if pad else m
    m_spec, x_spec, o_spec = _mv_specs(block_rows, N, k, interpret)
    y = pl.pallas_call(
        _mv_dual_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * block_rows, k), jnp.float32),
        grid=(nb,),
        in_specs=[m_spec, x_spec, x_spec],
        out_specs=o_spec,
        interpret=interpret,
    )(mp, xh, xl)
    y = y[:R]
    return y[:, 0] if squeeze else y


# ---------------------------------------------------------------------------
# Banded-block SpMV (ops/banded.py layout) — the large-mesh CG hot op.
#
# XLA's formulation builds the (B, W) overlapping x-windows in HBM every
# matvec (W/g slice-copies + a broadcast multiply-reduce), measured ~8x off
# roofline at the finest sweep rows.  Here the padded x is pinned whole in
# VMEM (L ~ 120 KB << 16 MB), the dense row-blocks stream through the grid
# once, and each row-block's window is a VMEM dynamic slice — the only HBM
# traffic is the blocks themselves, exactly once.
# ---------------------------------------------------------------------------


def _banded_kernel(x_ref, blocks_ref, o_ref, *, g, W, sb):
    i = pl.program_id(0)
    for j in range(sb):  # static unroll: sb row-blocks per grid step
        start = (i * sb + j) * g
        xw = x_ref[pl.ds(start, W), :]  # (W, m) window from pinned VMEM
        blk = blocks_ref[j]  # (R, W)
        # VPU multiply-reduce per RHS column — a (R, W) x (W, m<=2) MXU dot
        # pads its 1-2-wide output to full tiles (measured SLOWER than the
        # XLA windowed form at the finest mesh); the elementwise form
        # streams at bandwidth.
        m = xw.shape[1]
        cols = [
            jnp.sum(blk * xw[:, c][None, :], axis=1, keepdims=True)
            for c in range(m)
        ]
        o_ref[j] = cols[0] if m == 1 else jnp.concatenate(cols, axis=1)


def _banded_3d_imap(i):
    z = jnp.int32(0)
    return (jnp.asarray(i, jnp.int32), z, z)


def _pinned3_imap(i):
    z = jnp.int32(0)
    return (z, z, z)


@functools.partial(
    jax.jit, static_argnames=("g", "n_rows", "sb", "interpret")
)
def banded_matmat_pallas(
    blocks: jnp.ndarray,
    Xpad: jnp.ndarray,
    g: int,
    n_rows: int,
    sb: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Y = A @ X for a BandedMatrix's blocks (B, R, W), Xpad already padded
    to (L, m) with L = (B + W/g - 1)*g (ops/banded.py window convention)."""
    B, R, W = blocks.shape
    m = Xpad.shape[1]
    nb = pl.cdiv(B, sb)
    padb = nb * sb - B
    if padb:
        blocks = jnp.pad(blocks, ((0, padb), (0, 0), (0, 0)))
        # Windows of the zero pad blocks must stay in bounds.
        Xpad = jnp.pad(Xpad, ((0, padb * g), (0, 0)))
    mem = None if (interpret or _VMEM is None) else _VMEM
    kw = {} if mem is None else {"memory_space": mem}
    y = pl.pallas_call(
        functools.partial(_banded_kernel, g=g, W=W, sb=sb),
        out_shape=jax.ShapeDtypeStruct((nb * sb, R, m), jnp.float32),
        grid=(nb,),
        in_specs=[
            # Xpad pinned whole; the index map must be EXPLICIT i32 — the
            # default map canonicalizes to i64 under x64 and Mosaic rejects
            # it at lowering (see _row_block_imap).
            pl.BlockSpec(Xpad.shape, _pinned_imap, **kw),
            pl.BlockSpec((sb, R, W), _banded_3d_imap, **kw),
        ],
        out_specs=pl.BlockSpec((sb, R, m), _banded_3d_imap, **kw),
        interpret=interpret,
    )(Xpad, blocks)
    return y.reshape(nb * sb * R, m)[:n_rows]


def _banded_aligned_kernel(x_ref, blocks_ref, o_ref, *, g, W, sb):
    """Lane-aligned variant: x lives (L/128, 128, m) so every window is a
    cheap sublane-dim dynamic slice with full 128-lane parallelism; block
    b's stored window starts at floor(b*g/128)*128 in padded-x coords
    (ops/banded.py aligned128 layout)."""
    i = pl.program_id(0)
    R = blocks_ref.shape[1]
    Wr = W // 128
    m = x_ref.shape[2]
    for j in range(sb):
        # Index math must stay i32 end-to-end: under x64 the Python-int
        # literals promote the floor-divide to i64 and Mosaic's i64->i32
        # conversion helper recurses at lowering (observed on v5e).
        bbg = i * jnp.int32(sb * g) + jnp.int32(j * g)
        xw = x_ref[pl.ds(bbg // jnp.int32(128), Wr)]  # (Wr, 128, m)
        blk = blocks_ref[j]  # (R, W)
        # Accumulate per 128-lane tile with STATIC slices: Mosaic rejects
        # the (R, W) -> (R, Wr, 128) shape cast (lane-dim split), so the
        # window walk is an unrolled loop of lane-aligned (R, 128) tiles;
        # each tile is a VPU multiply + lane reduction at full width.
        cols = []
        for c in range(m):
            acc = None
            for w in range(Wr):
                bw = blk[:, w * 128 : (w + 1) * 128]  # (R, 128) static
                t = jnp.sum(bw * xw[w, :, c][None, :], axis=1, keepdims=True)
                acc = t if acc is None else acc + t
            cols.append(acc)  # (R, 1)
        o_ref[j] = cols[0] if m == 1 else jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit, static_argnames=("g", "n_rows", "sb", "interpret")
)
def banded_matmat_pallas_aligned(
    blocks: jnp.ndarray,
    Xpad: jnp.ndarray,
    g: int,
    n_rows: int,
    sb: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Y = A @ X for an aligned128 BandedMatrix; Xpad (L/128, 128, m)."""
    B, R, W = blocks.shape
    m = Xpad.shape[2]
    nb = pl.cdiv(B, sb)
    padb = nb * sb - B
    if padb:
        blocks = jnp.pad(blocks, ((0, padb), (0, 0), (0, 0)))
        extra = -(-(padb * g) // 128)
        Xpad = jnp.pad(Xpad, ((0, extra), (0, 0), (0, 0)))
    mem = None if (interpret or _VMEM is None) else _VMEM
    kw = {} if mem is None else {"memory_space": mem}
    y = pl.pallas_call(
        functools.partial(_banded_aligned_kernel, g=g, W=W, sb=sb),
        out_shape=jax.ShapeDtypeStruct((nb * sb, R, m), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(Xpad.shape, _pinned3_imap, **kw),
            pl.BlockSpec((sb, R, W), _banded_3d_imap, **kw),
        ],
        out_specs=pl.BlockSpec((sb, R, m), _banded_3d_imap, **kw),
        interpret=interpret,
    )(Xpad, blocks)
    return y.reshape(nb * sb * R, m)[:n_rows]
