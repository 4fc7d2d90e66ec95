"""Device sparse-matvec in ELL (padded per-row) layout.

FEM operators have bounded, near-uniform row occupancy, so ELL — a dense
(rows, max_nnz) gather + row-sum — maps far better onto the TPU's vector unit
than CSR's irregular segmented reductions.  This replaces the PETSc matvec
path of the reference (flow_solver.py:147-159's operators).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.tree_util.register_pytree_node_class
@dataclass
class EllMatrix:
    """Padded sparse matrix: cols (R, K) int32, vals (R, K) dtype.

    Padding entries have col 0 and val 0, so no masking is needed in the
    matvec.
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    shape: tuple

    def tree_flatten(self):
        return (self.cols, self.vals), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        return cls(children[0], children[1], shape)

    @classmethod
    def from_scipy(cls, A: sp.spmatrix, dtype=jnp.float64) -> "EllMatrix":
        A = A.tocsr()
        A.sum_duplicates()
        A.eliminate_zeros()
        R = A.shape[0]
        nnz_per_row = np.diff(A.indptr)
        K = max(int(nnz_per_row.max()), 1)
        cols = np.zeros((R, K), dtype=np.int32)
        vals = np.zeros((R, K), dtype=np.float64)
        for r in range(R):
            s, e = A.indptr[r], A.indptr[r + 1]
            cols[r, : e - s] = A.indices[s:e]
            vals[r, : e - s] = A.data[s:e]
        return cls(jnp.asarray(cols), jnp.asarray(vals, dtype=dtype), A.shape)

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 2:
            return self.matmat(x)
        return ell_matvec(self.cols, self.vals, x)

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        """Y[r, m] = sum_k vals[r, k] * X[cols[r, k], m]."""
        return jnp.einsum("rk,rkm->rm", self.vals, X[self.cols])


@partial(jax.jit, donate_argnums=())
def ell_matvec(cols: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y[r] = sum_k vals[r, k] * x[cols[r, k]]."""
    return jnp.sum(vals * x[cols], axis=1)
