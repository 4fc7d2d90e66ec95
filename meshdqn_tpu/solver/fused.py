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


def _coo_parts(A: sp.spmatrix):
    A = A.tocoo()
    return (
        jnp.asarray(A.row.astype(np.int32)),
        jnp.asarray(A.col.astype(np.int32)),
        jnp.asarray(A.data.astype(np.float32)),
        A.shape,
    )


def _densify(rows, cols, vals, shape):
    return jnp.zeros(shape, jnp.float32).at[rows, cols].add(vals)


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
) -> FusedOperators:
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
    f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    return FusedOperators(
        F1u=f32(F1u),
        F1p=f32(F1p),
        A1Z=f32(A1Z),
        k1=f32(A1i @ t1),
        F2p=f32(F2p),
        F2u=f32(F2u),
        k2=f32(A2i @ t2),
        F3s=f32(F3s),
        F3p=f32(np.stack([F3px, F3py])),
        k3=f32(np.concatenate([A3si @ t3[:Ns], A3si @ t3[Ns:]])),
        conv=conv,
        drag_u=f32(drag_u),
        drag_p=f32(drag_p),
        lift_u=f32(lift_u),
        lift_p=f32(lift_p),
        rho=jnp.asarray(rho, jnp.float32),
    )


def build_fused(
    *,
    A1bc: sp.spmatrix,
    A2bc: sp.spmatrix,
    A3bc_s: sp.spmatrix,
    R1: sp.spmatrix,
    P1m: sp.spmatrix,
    Kp: sp.spmatrix,
    BT: sp.spmatrix,
    Ms: sp.spmatrix,
    G: sp.spmatrix,
    z_u: np.ndarray,
    z_p: np.ndarray,
    t1: np.ndarray,
    t2: np.ndarray,
    t3: np.ndarray,
    dt: float,
    rho: float,
    conv: ConvectionKernel,
    drag_u,
    drag_p,
    lift_u,
    lift_p,
) -> FusedOperators:
    """Compose the fused operators on the default device in f32."""
    Ns = A3bc_s.shape[0]

    shapes = {}

    def _parts_of(name, A):
        p = _coo_parts(A)
        shapes[name] = p[3]
        return p[:3]

    def _build(a1, a2, a3s, r1, p1m, kp, bt, ms, g, zu, zp, t1v, t2v, t3v):
        def dens(name, parts):
            return _densify(*parts, shapes[name])

        A1d = dens("a1", a1)
        A2d = dens("a2", a2)
        A3sd = dens("a3s", a3s)
        A1i = jnp.linalg.inv(A1d)
        A2i = jnp.linalg.inv(A2d)
        A3si = jnp.linalg.inv(A3sd)
        A1Z = A1i * zu[None, :]
        A2Z = A2i * zp[None, :]
        A3Zs = A3si * zu[None, :Ns]

        R1d = dens("r1", r1)
        P1md = dens("p1m", p1m)
        Kpd = dens("kp", kp)
        BTd = dens("bt", bt)
        Msd = dens("ms", ms)
        Gd = dens("g", g)  # (2Ns, Np)

        F1u = jnp.matmul(A1Z, R1d, precision=HIGH)
        F1p = jnp.matmul(A1Z, P1md, precision=HIGH)
        k1 = A1i @ t1v
        F2p = jnp.matmul(A2Z, Kpd, precision=HIGH)
        F2u = -(1.0 / dt) * jnp.matmul(A2Z, BTd, precision=HIGH)
        k2 = A2i @ t2v
        F3s = jnp.matmul(A3Zs, Msd, precision=HIGH)
        F3px = -dt * jnp.matmul(A3Zs, Gd[:Ns], precision=HIGH)
        F3py = -dt * jnp.matmul(A3Zs, Gd[Ns:], precision=HIGH)
        k3 = jnp.concatenate([A3si @ t3v[:Ns], A3si @ t3v[Ns:]])
        return F1u, F1p, A1Z, k1, F2p, F2u, k2, F3s, jnp.stack([F3px, F3py]), k3

    args = (
        _parts_of("a1", A1bc),
        _parts_of("a2", A2bc),
        _parts_of("a3s", A3bc_s),
        _parts_of("r1", R1),
        _parts_of("p1m", P1m),
        _parts_of("kp", Kp),
        _parts_of("bt", BT),
        _parts_of("ms", Ms),
        _parts_of("g", G),
    )
    out = jax.jit(_build)(
        *args,
        jnp.asarray(z_u, jnp.float32),
        jnp.asarray(z_p, jnp.float32),
        jnp.asarray(t1, jnp.float32),
        jnp.asarray(t2, jnp.float32),
        jnp.asarray(t3, jnp.float32),
    )
    out = jax.block_until_ready(out)
    return FusedOperators(
        *out,
        conv=conv,
        drag_u=jnp.asarray(drag_u, jnp.float32),
        drag_p=jnp.asarray(drag_p, jnp.float32),
        lift_u=jnp.asarray(lift_u, jnp.float32),
        lift_p=jnp.asarray(lift_p, jnp.float32),
        rho=jnp.asarray(rho, jnp.float32),
    )


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
