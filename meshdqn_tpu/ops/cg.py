"""Fixed-iteration Jacobi-preconditioned conjugate gradients on ELL operators.

The dense invert-once IPCS path (solver/ipcs.py) stores (2Ns, 2Ns) inverses —
at the reference's finest sweep rows (ys930 @3395 vertices: 2Ns ~ 27k) those
matrices are the HBM budget, not the mesh.  But the two large IPCS systems
are mass-dominated (A1 = rho/dt M + CN viscosity with rho/dt = 1000,
A3 = mass), i.e. SPD with O(10) Jacobi-preconditioned condition number, so a
handful of CG iterations reach f32 roundoff — and warm-starting from the
previous time step's solution (the transient changes slowly at dt=1e-3)
keeps the count small.  This replaces the reference's MUMPS back-solves
(flow_solver.py:150-159) for meshes where invert-once does not fit.

TPU notes: the iteration count is STATIC (lax.scan, no data-dependent
control flow under jit); each iteration is one ELL gather-matvec plus a few
axis-0 reductions, all fused by XLA.  Division guards keep converged systems
(zero residual) at alpha = beta = 0 instead of NaN.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .sparse import EllMatrix


def ell_matmat(cols: jnp.ndarray, vals: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Y[r, m] = sum_k vals[r, k] * X[cols[r, k], m]  — multi-RHS ELL matvec."""
    return jnp.einsum("rk,rkm->rm", vals, X[cols])


@partial(jax.jit, static_argnames=("iters",))
def pcg(A, dinv: jnp.ndarray, B: jnp.ndarray, X0: jnp.ndarray,
        iters: int) -> jnp.ndarray:
    """Solve A X = B (SPD, multi-RHS) with `iters` Jacobi-PCG iterations.

    A is any operator pytree with .matmat (EllMatrix, or ops/banded.py's
    gather-free BandedMatrix — the TPU production layout).  B, X0: (n, m).
    Each column gets its own alpha/beta (the columns are independent solves
    sharing the streamed operator — the same pattern the Pallas dual-vector
    kernel exploits, docs/PALLAS.md).
    """

    def mv(X):
        return A.matmat(X)

    R = B - mv(X0)
    Z = dinv[:, None] * R
    P = Z
    rz = jnp.sum(R * Z, axis=0)

    def body(carry, _):
        X, R, P, rz = carry
        AP = mv(P)
        pAp = jnp.sum(P * AP, axis=0)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = dinv[:, None] * R
        rz_new = jnp.sum(R * Z, axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        P = Z + beta[None, :] * P
        return (X, R, P, rz_new), None

    (X, _, _, _), _ = jax.lax.scan(body, (X0, R, P, rz), None, length=iters)
    return X


def jacobi_inv(A: EllMatrix) -> jnp.ndarray:
    """1 / diag(A) from the ELL layout (diagonal entry per row)."""
    n = A.shape[0]
    rows = jnp.arange(n)
    diag = jnp.sum(
        jnp.where(A.cols == rows[:, None], A.vals, 0.0), axis=1
    )
    return jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 1.0)
