"""Fused-operator IPCS step: the whole linear update as dense MXU matmuls.

This is the TPU answer to the reference's per-step MUMPS back-solves + RHS
re-assembly (flow_solver.py:362-396): everything linear in the IPCS step is
constant, so it composes into fixed dense operators applied as matmuls.

The unfused step (ipcs.py) does per-step sparse ELL matvecs for every linear
RHS piece plus dense inverse applications.  Gathers are the TPU's weakest
memory op; but every linear piece is CONSTANT, so the solve/assemble/BC
pipeline composes into fixed dense operators:

    u* = F1u u^n + F1p p^n - rho A1Z c(u^n) + k1
    p' = F2p p^n + F2u u* + k2
    u' = [F3s u*_x + F3px (p'-p^n) + k3x ; F3s u*_y + F3py (p'-p^n) + k3y]

with  F1u = A1Z R1,  F1p = A1Z (B - Bn),  A1Z = A1bc^{-1} Z_u,
      F2p = A2Z Kp,  F2u = -(1/dt) A2Z B^T,
      F3s = A3Zs Ms (scalar mass block),  F3p* = -dt [A3Zs G_x; A3Zs G_y],
      k_i = A_ibc^{-1} t_i.

Per step that is 2 large (2Ns)^2 matvecs + one (Ns)^2-on-(Ns,2) matmul + a
few thin ones + the nonlinear convection kernel — ~0.5 GB of HBM traffic,
no gathers in the linear path.

Everything is BUILT ON DEVICE from the sparse operators (a few MB shipped),
including the f32 LU inversions — nothing dense crosses the host link, and
setup drops from ~35 s of single-core LAPACK to device milliseconds.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.convection import ConvectionKernel

HIGH = jax.lax.Precision.HIGHEST


class FusedOperators(NamedTuple):
    F1u: jnp.ndarray  # (2Ns, 2Ns)
    F1p: jnp.ndarray  # (2Ns, Np)
    A1Z: jnp.ndarray  # (2Ns, 2Ns)
    k1: jnp.ndarray  # (2Ns,)
    F2p: jnp.ndarray  # (Np, Np)
    F2u: jnp.ndarray  # (Np, 2Ns)
    k2: jnp.ndarray  # (Np,)
    F3s: jnp.ndarray  # (Ns, Ns)
    F3p: jnp.ndarray  # (2, Ns, Np) stacked x/y blocks
    k3: jnp.ndarray  # (2Ns,)
    conv: ConvectionKernel
    drag_u: jnp.ndarray
    drag_p: jnp.ndarray
    lift_u: jnp.ndarray
    lift_p: jnp.ndarray
    rho: jnp.ndarray


class SplitLow(NamedTuple):
    """Low limbs of the fused operators for the 'df32' step.

    Each matrix limb is bfloat16: |lo| <= 2^-24 |hi| entrywise, and bf16's
    8 mantissa bits on the limb put the representable operator error at
    ~2.4e-10 relative — the f32 entry rounding that otherwise accumulates
    as a SYSTEMATIC per-step bias (it is the same operator every step)
    drops by ~250x, while the limb stream costs half an f32 matrix of HBM
    traffic.  Vector limbs (k1/k2/k3) stay f32 (they are tiny)."""

    F1u: jnp.ndarray
    F1p: jnp.ndarray
    A1Z: jnp.ndarray
    k1: jnp.ndarray
    F2p: jnp.ndarray
    F2u: jnp.ndarray
    k2: jnp.ndarray
    F3s: jnp.ndarray
    F3p: jnp.ndarray
    k3: jnp.ndarray


def _split_mat(x64):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.bfloat16)
    return hi, lo


def _split_vec(x64):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def build_fused_host_f64(
    *,
    A1bc,
    A2bc,
    A3bc_s,
    R1,
    P1m,
    Kp,
    BT,
    Ms,
    G,
    z_u,
    z_p,
    t1,
    t2,
    t3,
    dt,
    rho,
    conv,
    drag_u,
    drag_p,
    lift_u,
    lift_p,
    split: bool = False,
):
    """Compose the fused operators in f64 on the host, then cast to f32.

    Removes the f32 inversion/composition error from the operator ENTRIES
    (each becomes the correctly-rounded f32 of the exact operator); the
    remaining fast-path error is pure f32 trajectory arithmetic.  Costs
    ~45 s of single-core LAPACK vs seconds on-device — worth it when the
    operators are reused for thousands of steps (IPCSConfig
    compose_on_host=True)."""
    import scipy.linalg

    Ns = A3bc_s.shape[0]
    A1i = scipy.linalg.inv(A1bc.toarray())
    A2i = scipy.linalg.inv(A2bc.toarray())
    A3si = scipy.linalg.inv(A3bc_s.toarray())
    A1Z = A1i * z_u[None, :]
    A2Z = A2i * z_p[None, :]
    A3Zs = A3si * z_u[None, :Ns]
    F1u = A1Z @ R1.toarray()
    F1p = A1Z @ P1m.toarray()
    F2p = A2Z @ Kp.toarray()
    F2u = -(1.0 / dt) * (A2Z @ BT.toarray())
    F3s = A3Zs @ Ms.toarray()
    Gd = G.toarray()
    F3px = -dt * (A3Zs @ Gd[:Ns])
    F3py = -dt * (A3Zs @ Gd[Ns:])
    k1 = A1i @ t1
    k2 = A2i @ t2
    F3p = np.stack([F3px, F3py])
    k3 = np.concatenate([A3si @ t3[:Ns], A3si @ t3[Ns:]])
    f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    dev = FusedOperators(
        F1u=f32(F1u),
        F1p=f32(F1p),
        A1Z=f32(A1Z),
        k1=f32(k1),
        F2p=f32(F2p),
        F2u=f32(F2u),
        k2=f32(k2),
        F3s=f32(F3s),
        F3p=f32(F3p),
        k3=f32(k3),
        conv=conv,
        drag_u=f32(drag_u),
        drag_p=f32(drag_p),
        lift_u=f32(lift_u),
        lift_p=f32(lift_p),
        rho=jnp.asarray(rho, jnp.float32),
    )
    if not split:
        return dev

    def lo_mat(x64, hi):
        return jnp.asarray(
            (np.asarray(x64) - np.asarray(hi, np.float64)).astype(np.float32),
            jnp.bfloat16,
        )

    def lo_vec(x64, hi):
        return jnp.asarray(
            (np.asarray(x64) - np.asarray(hi, np.float64)).astype(np.float32)
        )

    lo = SplitLow(
        F1u=lo_mat(F1u, dev.F1u),
        F1p=lo_mat(F1p, dev.F1p),
        A1Z=lo_mat(A1Z, dev.A1Z),
        k1=lo_vec(k1, dev.k1),
        F2p=lo_mat(F2p, dev.F2p),
        F2u=lo_mat(F2u, dev.F2u),
        k2=lo_vec(k2, dev.k2),
        F3s=lo_mat(F3s, dev.F3s),
        F3p=lo_mat(F3p, dev.F3p),
        k3=lo_vec(k3, dev.k3),
    )
    return dev, lo


def _coo64(A, nnz_pad: int = 0):
    """COO triplet arrays for device-side densification.

    nnz_pad > 0 quantizes the entry count up to a multiple by appending
    explicit (0, 0, 0.0) entries — exact under the `_dense64` scatter-add,
    and it makes the composition modules' input shapes (and therefore the
    compiled programs) identical across meshes whose dof counts share a
    pad_quantum bucket: a one-vertex removal changes nnz, and without this
    every deploy re-simulation paid the remote compile service ~20-40 s
    for an otherwise-identical module (measured r5; docs/AXON.md)."""
    A = sp.coo_matrix(A)
    row = A.row.astype(np.int32)
    col = A.col.astype(np.int32)
    dat = A.data.astype(np.float64)
    if nnz_pad:
        k = -(-len(dat) // nnz_pad) * nnz_pad - len(dat)
        if k:
            row = np.concatenate([row, np.zeros(k, np.int32)])
            col = np.concatenate([col, np.zeros(k, np.int32)])
            dat = np.concatenate([dat, np.zeros(k, np.float64)])
    return (jnp.asarray(row), jnp.asarray(col), jnp.asarray(dat))


def _dense64(coo, shape):
    r, c, v = coo
    return jnp.zeros(shape, jnp.float64).at[r, c].add(v)


def _ns_inverse(A32: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Approximate inverse by Newton–Schulz: X <- X (2I - A X).

    Replaces `jnp.linalg.inv` in the on-device composition.  The TPU
    lowering of LU produces a ~26 MB serial panel-factorization executable
    (measured: the jit__lambda entries in the compile cache) that must be
    shipped to the remote worker on every fresh process; Newton–Schulz is
    two MXU matmuls per iteration — a ~25x smaller executable, no serial
    panels, and the same f32 terminal accuracy (~cond*eps), which the f64
    iterative refinement downstream (_refined_solve) polishes identically.

    The iteration runs on the symmetrically Jacobi-scaled matrix
    At = D^-1/2 A D^-1/2 (D = |diag A|): on graded FEM meshes the raw
    mass-matrix conditioning is dominated by the element-area spread of the
    diagonal (h^2 ratios of ~1e3 near the airfoil, plus rho/dt-scaled rows
    against unit BC rows) — measured on ys930, unscaled NS-20 left the
    velocity systems at O(1) error while scaling brings every system's
    kappa down to its uniform-mesh value.  A^-1 = D^-1/2 At^-1 D^-1/2.

    X0 = At^T / (||At||_1 ||At||_inf) guarantees rho(I - At X0) < 1 for
    any nonsingular At (eigenvalues of At At^T / s lie in (0, 1]);
    convergence needs ~log2(kappa^2 * ln(1/eps)) iterations: ~24 covers the
    scaled mass-dominated systems (kappa <~ 1e2), ~40 the scaled pressure
    Poisson block (kappa ~ 1/h^2 <~ 1e4 at the dense-path cap).
    """
    d = jnp.abs(jnp.diagonal(A32))
    s = jnp.where(d > 0, jax.lax.rsqrt(jnp.where(d > 0, d, 1.0)), 1.0)
    At = A32 * s[:, None] * s[None, :]
    a1 = jnp.max(jnp.sum(jnp.abs(At), axis=0))
    ainf = jnp.max(jnp.sum(jnp.abs(At), axis=1))
    X = At.T / (a1 * ainf)
    eye2 = 2.0 * jnp.eye(A32.shape[0], dtype=A32.dtype)

    def body(X, _):
        AX = jnp.matmul(At, X, precision=HIGH)
        return jnp.matmul(X, eye2 - AX, precision=HIGH), None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    return X * s[:, None] * s[None, :]


def _refined_solve(A64, B64, iters, chunk=2048, inv_iters=0):
    """X ~= A^-1 B with f32 LU + f64-residual iterative refinement.

    TPUs have no f64 LU (jnp.linalg.inv fails in f64), but XLA emulates f64
    *matmul* (double-f32 passes), so each sweep

        X_0 = A^-1_(f32) B,   X_(k+1) = X_k + A^-1_(f32) (B - A X_k)_(f64)

    cuts the error by ~cond(A)*eps_f32 until the f64 composition fixed
    point; casting X to f32 then yields the same correctly-rounded operator
    entries as the host-f64 path (verified to ~1e-12 rel of
    build_fused_host_f64 on ys930).

    B's columns stream through `lax.map` in fixed `chunk`-wide blocks: the
    emulated-f64 matmul materializes ~8 f32 limb copies of its operands, so
    an unchunked (n, 2n+m) B peaks at several GB of HLO temps and the
    remote compiler aborts above ~7k dofs (seen at sweep resolution 0.14).
    Chunked, the peak is ~8 * n * chunk * 4 B regardless of mesh size.
    """
    n = A64.shape[0]
    ncols = B64.shape[1]
    A32 = A64.astype(jnp.float32)
    Ainv32 = (
        _ns_inverse(A32, inv_iters) if inv_iters else jnp.linalg.inv(A32)
    )

    pad = (-ncols) % chunk
    Bp = jnp.pad(B64, ((0, 0), (0, pad)))
    nblk = Bp.shape[1] // chunk
    # (nblk, n, chunk) column blocks
    blocks = jnp.moveaxis(Bp.reshape(n, nblk, chunk), 1, 0)

    def solve_block(Bb):
        X = jnp.matmul(Ainv32, Bb.astype(jnp.float32), precision=HIGH).astype(
            jnp.float64
        )
        for _ in range(iters):
            R = Bb - jnp.matmul(A64, X)
            X = X + jnp.matmul(
                Ainv32, R.astype(jnp.float32), precision=HIGH
            ).astype(jnp.float64)
        return X

    Xb = jax.lax.map(solve_block, blocks)  # (nblk, n, chunk)
    X = jnp.moveaxis(Xb, 0, 1).reshape(n, nblk * chunk)
    return X[:, :ncols]


@partial(jax.jit, static_argnames=("n1", "npp", "iters", "split", "inv_iters"))
def _compose_sys1(A_coo, R1_coo, P1m_coo, zu, t1, n1, npp, iters, split=False, inv_iters=0):
    """Tentative-velocity system -> (F1u, F1p, A1Z, k1), one XLA module.

    split=True returns ((hi, lo), ...) limb pairs for the df32 step."""
    A64 = _dense64(A_coo, (n1, n1))
    B = jnp.concatenate(
        [
            zu[:, None] * _dense64(R1_coo, (n1, n1)),
            zu[:, None] * _dense64(P1m_coo, (n1, npp)),
            jnp.diag(zu),  # -> A1Z = A1^-1 diag(z_u)
            t1[:, None],
        ],
        axis=1,
    )
    X = _refined_solve(A64, B, iters, inv_iters=inv_iters)
    blocks = (
        X[:, :n1],
        X[:, n1 : n1 + npp],
        X[:, n1 + npp : 2 * n1 + npp],
        X[:, -1],
    )
    if split:
        return tuple(_split_mat(b) for b in blocks[:3]) + (_split_vec(blocks[3]),)
    f32 = lambda a: a.astype(jnp.float32)
    return tuple(f32(b) for b in blocks)


@partial(jax.jit, static_argnames=("npp", "n1", "iters", "split", "inv_iters"))
def _compose_sys2(A_coo, Kp_coo, BT_coo, zp, t2, dt, npp, n1, iters, split=False, inv_iters=0):
    """Pressure-Poisson system -> (F2p, F2u, k2)."""
    A64 = _dense64(A_coo, (npp, npp))
    B = jnp.concatenate(
        [
            zp[:, None] * _dense64(Kp_coo, (npp, npp)),
            zp[:, None] * _dense64(BT_coo, (npp, n1)),
            t2[:, None],
        ],
        axis=1,
    )
    X = _refined_solve(A64, B, iters, inv_iters=inv_iters)
    blocks = (X[:, :npp], -(1.0 / dt) * X[:, npp : npp + n1], X[:, -1])
    if split:
        return (
            _split_mat(blocks[0]),
            _split_mat(blocks[1]),
            _split_vec(blocks[2]),
        )
    f32 = lambda a: a.astype(jnp.float32)
    return tuple(f32(b) for b in blocks)


@partial(jax.jit, static_argnames=("ns", "npp", "iters", "split", "inv_iters"))
def _compose_sys3(A_coo, Ms_coo, G_coo, zs, t3x, t3y, dt, ns, npp, iters, split=False, inv_iters=0):
    """Scalar-mass (velocity-correction) system -> (F3s, F3p, k3)."""
    A64 = _dense64(A_coo, (ns, ns))
    G64 = _dense64(G_coo, (2 * ns, npp))
    B = jnp.concatenate(
        [
            zs[:, None] * _dense64(Ms_coo, (ns, ns)),
            zs[:, None] * G64[:ns],
            zs[:, None] * G64[ns:],
            t3x[:, None],
            t3y[:, None],
        ],
        axis=1,
    )
    X = _refined_solve(A64, B, iters, inv_iters=inv_iters)
    F3s64 = X[:, :ns]
    F3p64 = jnp.stack(
        [-dt * X[:, ns : ns + npp], -dt * X[:, ns + npp : ns + 2 * npp]]
    )
    k364 = jnp.concatenate([X[:, -2], X[:, -1]])
    if split:
        return _split_mat(F3s64), _split_mat(F3p64), _split_vec(k364)
    f32 = lambda a: a.astype(jnp.float32)
    return f32(F3s64), f32(F3p64), f32(k364)


def build_fused_refined(
    *,
    A1bc,
    A2bc,
    A3bc_s,
    R1,
    P1m,
    Kp,
    BT,
    Ms,
    G,
    z_u,
    z_p,
    t1,
    t2,
    t3,
    dt,
    rho,
    conv,
    drag_u,
    drag_p,
    lift_u,
    lift_p,
    split: bool = False,
    inv_iters: tuple = (24, 40, 24),
    nnz_quantum: int = 0,
):
    """Compose the fused operators ON DEVICE at f64-composition accuracy.

    Only the sparse COO operator data (a few MB) crosses the host link; each
    system densifies, inverts (f32), and iteratively refines inside ONE
    jitted module (3 modules total — the remote-TPU compile service charges
    10-40 s per module, and the persistent compilation cache makes them
    one-time costs per mesh shape).  The well-conditioned mass-dominated
    systems converge in 2 sweeps but lift accuracy measurably prefers 3;
    all systems get 3 (the extra f64 sweep costs ~3 s once per mesh).
    """
    Ns = A3bc_s.shape[0]
    n1 = A1bc.shape[0]
    npp = A2bc.shape[0]
    f64 = lambda a: jnp.asarray(a, jnp.float64)

    # Newton–Schulz inverse iteration counts per system (0 = LU): the
    # mass-dominated velocity/correction systems converge fast; the
    # pressure Poisson block needs more (see _ns_inverse).  The Jacobi
    # scaling makes the NS inverse's refinement contraction (~kappa_scaled
    # * eps per sweep) at least as strong as raw-kappa LU's, so the sweep
    # count stays at 3.
    ii1, ii2, ii3 = inv_iters
    q = nnz_quantum
    F1u, F1p, A1Z, k1 = _compose_sys1(
        _coo64(A1bc, q), _coo64(R1, q), _coo64(P1m, q), f64(z_u), f64(t1),
        n1=n1, npp=npp, iters=3, split=split, inv_iters=ii1,
    )
    F2p, F2u, k2 = _compose_sys2(
        _coo64(A2bc, q), _coo64(Kp, q), _coo64(BT, q), f64(z_p), f64(t2),
        jnp.asarray(dt, jnp.float64), npp=npp, n1=n1,
        iters=3, split=split, inv_iters=ii2,
    )
    F3s, F3p, k3 = _compose_sys3(
        _coo64(A3bc_s, q), _coo64(Ms, q), _coo64(G, q), f64(z_u[:Ns]),
        f64(t3[:Ns]), f64(t3[Ns:]), jnp.asarray(dt, jnp.float64),
        ns=Ns, npp=npp, iters=3, split=split, inv_iters=ii3,
    )

    if split:
        lo = SplitLow(
            F1u=F1u[1], F1p=F1p[1], A1Z=A1Z[1], k1=k1[1],
            F2p=F2p[1], F2u=F2u[1], k2=k2[1],
            F3s=F3s[1], F3p=F3p[1], k3=k3[1],
        )
        F1u, F1p, A1Z, k1 = F1u[0], F1p[0], A1Z[0], k1[0]
        F2p, F2u, k2 = F2p[0], F2u[0], k2[0]
        F3s, F3p, k3 = F3s[0], F3p[0], k3[0]

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    out = FusedOperators(
        F1u=F1u,
        F1p=F1p,
        A1Z=A1Z,
        k1=k1,
        F2p=F2p,
        F2u=F2u,
        k2=k2,
        F3s=F3s,
        F3p=F3p,
        k3=k3,
        conv=conv,
        drag_u=f32(drag_u),
        drag_p=f32(drag_p),
        lift_u=f32(lift_u),
        lift_p=f32(lift_p),
        rho=jnp.asarray(rho, jnp.float32),
    )
    if split:
        return jax.block_until_ready(out), jax.block_until_ready(lo)
    return jax.block_until_ready(out)


def fused_step(dev: FusedOperators, state):
    """One IPCS step via the fused dense operators; returns
    (new_state, (drag, lift))."""
    from .ipcs import FlowState

    u_n, p_n = state
    c = dev.conv(u_n)
    u_star = (
        jnp.matmul(dev.F1u, u_n, precision=HIGH)
        + jnp.matmul(dev.F1p, p_n, precision=HIGH)
        - dev.rho * jnp.matmul(dev.A1Z, c, precision=HIGH)
        + dev.k1
    )
    p_new = (
        jnp.matmul(dev.F2p, p_n, precision=HIGH)
        + jnp.matmul(dev.F2u, u_star, precision=HIGH)
        + dev.k2
    )
    dp = p_new - p_n
    ns = dev.F3s.shape[0]
    ustack = jnp.stack([u_star[:ns], u_star[ns:]], axis=1)  # (Ns, 2)
    y = jnp.matmul(dev.F3s, ustack, precision=HIGH)  # (Ns, 2)
    corr = jnp.einsum("cnp,p->nc", dev.F3p, dp, precision=HIGH)  # (Ns, 2)
    y = y + corr
    u_new = jnp.concatenate([y[:, 0], y[:, 1]]) + dev.k3

    new_state = FlowState(u=u_new, p=p_new)
    drag = dev.drag_u @ u_new + dev.drag_p @ p_new
    lift = dev.lift_u @ u_new + dev.lift_p @ p_new
    return new_state, (drag, lift)


def fused_step_df32(dev: FusedOperators, lo: SplitLow, state):
    """One IPCS step with split-operator (f32-hi + bf16-lo) matvecs.

    The f32 fast path's dominant trajectory error is SYSTEMATIC: every
    operator entry carries its fixed f32 rounding (~6e-8 rel), applied
    identically on all 5000 steps — a linear-accumulating bias of ~3e-4,
    which is exactly the observed f32 lift error (solver/ipcs.py precision
    notes).  Streaming the bf16 low limb alongside and adding its (tiny)
    matvec contribution removes that bias at +50% operator HBM traffic;
    the remaining error is unbiased per-step f32 rounding, a ~1e-6-level
    random walk.  Low-limb matmuls run as single native MXU bf16 passes.
    """
    from .ipcs import FlowState

    bf16 = jnp.bfloat16
    f32 = jnp.float32

    def mml(m_lo, x):
        # bf16 x bf16 -> f32: one native MXU pass; the operand rounding is
        # ~0.4% of a 2^-24-scale term, i.e. ~2.4e-10 of the hi operator.
        return jnp.matmul(m_lo, x.astype(bf16), preferred_element_type=f32)

    u_n, p_n = state
    c = dev.conv(u_n)
    u_hi = (
        jnp.matmul(dev.F1u, u_n, precision=HIGH)
        + jnp.matmul(dev.F1p, p_n, precision=HIGH)
        - dev.rho * jnp.matmul(dev.A1Z, c, precision=HIGH)
        + dev.k1
    )
    u_corr = mml(lo.F1u, u_n) + mml(lo.F1p, p_n) - dev.rho * mml(lo.A1Z, c) + lo.k1
    u_star = u_hi + u_corr

    p_hi = (
        jnp.matmul(dev.F2p, p_n, precision=HIGH)
        + jnp.matmul(dev.F2u, u_star, precision=HIGH)
        + dev.k2
    )
    p_new = p_hi + (mml(lo.F2p, p_n) + mml(lo.F2u, u_star) + lo.k2)

    dp = p_new - p_n
    ns = dev.F3s.shape[0]
    ustack = jnp.stack([u_star[:ns], u_star[ns:]], axis=1)  # (Ns, 2)
    y = jnp.matmul(dev.F3s, ustack, precision=HIGH)
    y = y + jnp.einsum("cnp,p->nc", dev.F3p, dp, precision=HIGH)
    y_corr = jnp.matmul(lo.F3s, ustack.astype(bf16), preferred_element_type=f32)
    y_corr = y_corr + jnp.einsum(
        "cnp,p->nc", lo.F3p, dp.astype(bf16), preferred_element_type=f32
    )
    y = y + y_corr
    u_new = jnp.concatenate([y[:, 0], y[:, 1]]) + dev.k3 + lo.k3

    new_state = FlowState(u=u_new, p=p_new)
    drag = dev.drag_u @ u_new + dev.drag_p @ p_new
    lift = dev.lift_u @ u_new + dev.lift_p @ p_new
    return new_state, (drag, lift)
