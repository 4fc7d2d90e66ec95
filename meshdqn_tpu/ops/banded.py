"""Gather-free banded-block SpMV for RCM-reordered FEM operators.

Why this exists: the ELL matvec's `x[cols]` gather lowers to a scalar
element loop on TPU — measured 11.15 ms for a 29,768x50 ELL operand
(~6 MB values + 6 MB gathered x, ~700x off the HBM roofline) on the v5e,
which made the large-mesh CG path (scripts/cg_microbench.py) 300 ms/step,
3.5-6x SLOWER than the reference's CPU MUMPS rows
(/root/reference/training_results/benchmark_results/*.csv).

The fix: after a reverse Cuthill-McKee reordering every column index of row
r lies in a window of width W around the diagonal (measured W ~ 1.7k of
n ~ 30k at the reference's finest sweep rows).  Store the matrix as dense
row-blocks over that window:

    blocks[b, i, j] = A[b*R + i, b*g - pad + j]      (B, R, W)

and the matvec needs NO gather at all: the overlapping x-windows

    X_win[b, j] = xpad[b*g + j]                      (B, W)

are built from W/g static slices of a zero-padded x (pure reshapes +
concatenate — vectorized moves), and

    y = einsum('brw,bw->br', blocks, X_win)

is a batched dense contraction the TPU streams at memory bandwidth.  The
column advance per row-block `g` generalizes rectangular operators between
the P2 velocity / P2 scalar / P1 pressure spaces (g = R * n_cols/n_rows):
g = R for square operators, R/2 for (2Ns x Ns), 2R for (Ns x 2Ns).

This is the TPU-native replacement for the PETSc/MUMPS back-solve data
path (reference flow_solver.py:147-159) at mesh sizes where the dense
invert-once operators no longer fit HBM.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


# Pallas banded kernel on TPU (f32): opt-in via MESHDQN_BANDED_PALLAS=1
# until profiled end-to-end on hardware (the XLA windowed formulation is
# the verified production path; the kernel is interpret-mode tested).
import os as _os

USE_PALLAS = _os.environ.get("MESHDQN_BANDED_PALLAS", "0") == "1"


def rcm_permutation(pattern: sp.spmatrix) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of a symmetric sparsity pattern.

    Returns `perm` with perm[new] = old (scipy convention: A[perm][:, perm]
    has reduced bandwidth).
    """
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(
        reverse_cuthill_mckee(pattern.tocsr(), symmetric_mode=True),
        dtype=np.int64,
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class BandedMatrix:
    """Dense banded row-blocks: blocks (B, R, W); col window of block b
    starts at b*g - pad.

    With `aligned128` the stored window of block b instead starts at the
    128-FLOOR of b*g in padded-x coordinates (entries shifted right by
    (b*g) mod 128, W widened to absorb it): the Pallas kernel can then
    take each window as a cheap sublane-dim dynamic slice of x laid out
    (L/128, 128) — full 128-lane parallelism — instead of a (L, 1) column
    that uses one lane (measured slower than the XLA form)."""

    blocks: jnp.ndarray
    pad: int
    g: int
    shape: tuple
    aligned128: bool = False

    def tree_flatten(self):
        return (self.blocks,), (self.pad, self.g, self.shape, self.aligned128)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1], aux[2], aux[3])

    @property
    def nbytes(self) -> int:
        return int(self.blocks.size) * self.blocks.dtype.itemsize

    # ------------------------------------------------------------------
    @classmethod
    def from_scipy(
        cls,
        A: sp.spmatrix,
        dtype=jnp.float32,
        R: int | None = None,
        g: int | None = None,
        device_build: bool = True,
        aligned128: bool | None = None,
    ) -> "BandedMatrix":
        """Build from a (reordered) scipy matrix.

        R (rows per block) defaults to 128 on the TPU backend and 8
        elsewhere.  R=128 is the round-4 production layout: the R=8
        blocks (B~3.7k tiny (8, W) tiles at the finest sweep row) hit
        ~53 GB/s through every XLA formulation tried, while the identical
        algebra over (128, W) tiles streams at 370 GB/s (0.33 ms vs
        2.28 ms per matvec, scripts/banded_formulation_bench.py chain-150
        asymptote, v5e) — and ties the Pallas kernel (382 GB/s), so the
        plain-XLA form stays the production path.

        g defaults to round(R * n_cols / n_rows) — the column advance per
        row-block that keeps a banded operator's windows centered.  With
        `device_build` the dense blocks are scattered on device from the
        COO triplets (uploads nnz, not B*R*W — the blocks can be hundreds
        of MB while the triplets are a few MB over the remote tunnel).
        aligned128 (default: the USE_PALLAS setting) stores the kernel's
        lane-aligned window layout.
        """
        if R is None:
            R = 128 if jax.default_backend() == "tpu" else 8
        if aligned128 is None:
            aligned128 = USE_PALLAS
        A = A.tocsr()
        A.sum_duplicates()
        A.eliminate_zeros()
        n_rows, n_cols = A.shape
        if g is None:
            g = max(int(round(R * n_cols / n_rows)), 1)
        coo = A.tocoo()
        row = coo.row.astype(np.int64)
        col = coo.col.astype(np.int64)
        vals = coo.data
        B = -(-n_rows // R)
        b = row // R
        pad = int(max(0, (b * g - col).max())) if len(row) else 0
        if aligned128:
            # Window of block b starts at floor(b*g/128)*128 in padded-x
            # coords (xpad index = col + pad).
            j = col + pad - (b * g // 128) * 128
        else:
            j = col - b * g + pad
        W_req = int(j.max()) + 1 if len(row) else 1
        # W multiple of lcm(g, 128): g | W for the window reshape trick,
        # 128 | W for lane-aligned blocks.
        align = int(np.lcm(g, 128))
        W = -(-W_req // align) * align
        # The padded x must cover col index (B-1)*g - pad + W - 1 AND the
        # plain range [0, n_cols): ensure L = (B + W/g - 1)*g >= n_cols + pad.
        while (B + W // g - 1) * g < n_cols + pad:
            W += align
        flat_idx = row * W + j
        if device_build:
            blocks = (
                jnp.zeros(B * R * W, dtype=dtype)
                .at[jnp.asarray(flat_idx)]
                .set(jnp.asarray(vals, dtype=dtype))
                .reshape(B, R, W)
            )
        else:
            dense = np.zeros((B * R, W), dtype=np.float64)
            dense[row, j] = vals
            blocks = jnp.asarray(dense.reshape(B, R, W), dtype=dtype)
        return cls(
            blocks=blocks, pad=pad, g=g, shape=A.shape, aligned128=aligned128
        )

    # ------------------------------------------------------------------
    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        """Y = A @ X for X (n_cols, m) — gather-free windowed contraction.

        On TPU (f32) this dispatches to the Pallas kernel: padded x pinned
        whole in VMEM, blocks streamed once, per-row-block windows as VMEM
        dynamic slices — HBM traffic is exactly the blocks.  The XLA
        formulation (banded_matmat) materializes the (B, W) window array in
        HBM every matvec (measured ~8x off roofline) and remains the CPU /
        f64 / fallback path.
        """
        if self.aligned128:
            from .pallas_kernels import banded_matmat_pallas_aligned

            B, R, W = self.blocks.shape
            # Cover the largest aligned window AND the plain x range,
            # rounded to whole 128-lane rows.
            L = max(((B - 1) * self.g // 128) * 128 + W,
                    self.shape[1] + self.pad)
            L = -(-L // 128) * 128
            mr = X.shape[1]
            Xpad = jnp.zeros((L, mr), dtype=jnp.float32)
            Xpad = jax.lax.dynamic_update_slice(
                Xpad, X.astype(jnp.float32), (self.pad, 0)
            )
            interpret = jax.default_backend() != "tpu"
            return banded_matmat_pallas_aligned(
                self.blocks,
                Xpad.reshape(L // 128, 128, mr),
                self.g,
                self.shape[0],
                interpret=interpret,
            )
        return banded_matmat(self.blocks, X, self.pad, self.g, self.shape)

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 1:
            return self.matmat(x[:, None])[:, 0]
        return self.matmat(x)


def banded_matmat(blocks, X, pad, g, shape):
    n_rows, n_cols = shape
    B, R, W = blocks.shape
    m = W // g
    L = (B + m - 1) * g
    mr = X.shape[1]
    Xpad = jnp.zeros((L, mr), dtype=X.dtype)
    Xpad = jax.lax.dynamic_update_slice(Xpad, X, (pad, 0))
    Z = Xpad.reshape(B + m - 1, g, mr)
    # Broadcast-multiply + reduce, NOT einsum/dot_general: a batched
    # (R, W) @ (W, mr<=2) matmul pads its tiny output dim to MXU tiles
    # (measured ~10x off roofline at mr=1); the elementwise form fuses
    # into a VPU multiply-reduce that streams `blocks` once.  mr is
    # static and small (1 or 2), so the python loops just unroll.
    if m <= 32:
        # q-partitioned accumulation (production, R=128 layouts): each of
        # the m terms streams its own (B, R, g) slice of `blocks` against
        # a shifted view of Z — no (B, W) window array is materialized.
        # 370 GB/s at the finest sweep row vs 53 GB/s for the windowed
        # concat over the old R=8 layout (same algebra; the win is the
        # (128, W) tile shape — scripts/banded_formulation_bench.py).
        acc_dt = jnp.promote_types(blocks.dtype, jnp.float32)
        Y = jnp.zeros((B, R, mr), dtype=acc_dt)
        for q in range(m):
            bq = blocks[:, :, q * g : (q + 1) * g]
            zq = Z[q : q + B].astype(blocks.dtype)
            for i in range(mr):
                Y = Y.at[..., i].add(
                    jnp.sum(bq * zq[..., i][:, None, :], axis=2,
                            dtype=acc_dt)
                )
        return Y.reshape(B * R, mr)[:n_rows]
    # Legacy windowed-concat form (R=8 layouts: m = W/g is large, the
    # unrolled q-loop would emit hundreds of slices).
    X_win = jnp.concatenate([Z[q : q + B] for q in range(m)], axis=1)
    X_win = X_win.astype(blocks.dtype)
    outs = [
        jnp.sum(blocks * X_win[..., i][:, None, :], axis=2) for i in range(mr)
    ]
    Y = jnp.stack(outs, axis=-1)  # (B, R, mr)
    return Y.reshape(B * R, mr)[:n_rows]


def permute_interleave_u(Ns: int, rank_s: np.ndarray) -> np.ndarray:
    """new2old index map for the velocity space: concatenated [ux; uy]
    (old) -> component-interleaved scalar-RCM order (new), so cross-
    component viscous coupling stays within 2*beta_s of the diagonal and
    the (Ns, 2) component split is a free reshape.

    new2old[2*rank_s[j] + c] = c*Ns + j
    """
    new2old = np.empty(2 * Ns, dtype=np.int64)
    j = np.arange(Ns)
    new2old[2 * rank_s] = j
    new2old[2 * rank_s + 1] = Ns + j
    return new2old
