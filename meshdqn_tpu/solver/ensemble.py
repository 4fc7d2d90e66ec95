"""Ensemble flows: B inflow amplitudes on ONE mesh as matrix-column states.

The IPCS system matrices depend on the mesh and the *locations* of the
Dirichlet dofs — not on the inflow values.  Scaling the inlet amplitude
Um -> s * Um scales the BC value vector g linearly, hence also the affine
step vectors (t_i = g - Z A_i g and k_i = A_i^{-1} t_i).  So an ensemble of
B inflow amplitudes (a Reynolds sweep at fixed geometry) shares every fused
operator: stack the B states as matrix COLUMNS and each per-step matvec
becomes one (n, n) x (n, B) MXU matmul — the operator streams from HBM once
for the whole ensemble, so the per-flow cost collapses toward 1/B of the
single-flow step (vs. the reference running B separate FEniCS solves).

This is a capability the reference does not have; its resolution/parameter
studies are strictly sequential (SURVEY.md §6).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import TriMesh
from .fused import FusedOperators, HIGH
from .ipcs import IPCSConfig, IPCSSolver


class EnsembleState(NamedTuple):
    u: jnp.ndarray  # (2Ns, B)
    p: jnp.ndarray  # (Np, B)


def ensemble_step(dev: FusedOperators, K1, K3, state: EnsembleState):
    """One IPCS step for all ensemble members.

    K1/K3: (2Ns, B) per-member affine vectors (amplitude-scaled k1/k3).
    """
    u_n, p_n = state
    # Convection per member (nonlinear): vmap over columns.
    c = jax.vmap(dev.conv, in_axes=1, out_axes=1)(u_n)  # (2Ns, B)
    u_star = (
        jnp.matmul(dev.F1u, u_n, precision=HIGH)
        + jnp.matmul(dev.F1p, p_n, precision=HIGH)
        - dev.rho * jnp.matmul(dev.A1Z, c, precision=HIGH)
        + K1
    )
    p_new = (
        jnp.matmul(dev.F2p, p_n, precision=HIGH)
        + jnp.matmul(dev.F2u, u_star, precision=HIGH)
        + dev.k2[:, None]
    )
    dp = p_new - p_n
    ns = dev.F3s.shape[0]
    # (Ns, 2B): both components of every member through the scalar block.
    ustack = jnp.concatenate([u_star[:ns], u_star[ns:]], axis=1)
    y = jnp.matmul(dev.F3s, ustack, precision=HIGH)
    B = u_n.shape[1]
    corr_x = jnp.matmul(dev.F3p[0], dp, precision=HIGH)  # (Ns, B)
    corr_y = jnp.matmul(dev.F3p[1], dp, precision=HIGH)
    u_new = jnp.concatenate(
        [y[:, :B] + corr_x, y[:, B:] + corr_y], axis=0
    ) + K3
    new_state = EnsembleState(u=u_new, p=p_new)
    drag = dev.drag_u @ u_new + dev.drag_p @ p_new  # (B,)
    lift = dev.lift_u @ u_new + dev.lift_p @ p_new
    return new_state, (drag, lift)


@partial(jax.jit, static_argnames=("n_steps",))
def _evolve_ensemble(dev, K1, K3, state, n_steps: int):
    def body(s, _):
        return ensemble_step(dev, K1, K3, s)

    return jax.lax.scan(body, state, None, length=n_steps)


class EnsembleFlows:
    """B inflow amplitudes on one mesh, one fused operator set."""

    def __init__(
        self,
        mesh: TriMesh,
        amplitudes: Sequence[float],
        config: IPCSConfig | None = None,
    ):
        """amplitudes: multiplier on the reference inlet profile (Um = 1.5
        at amplitude 1.0)."""
        config = config or IPCSConfig(precision="f32", fused=True)
        if config.precision != "f32":
            raise ValueError("ensembles require the fused f32 path")
        config.fused = True
        self.solver = IPCSSolver(mesh, config)
        self.amps = jnp.asarray(np.asarray(amplitudes, dtype=np.float32))
        self.B = len(amplitudes)
        dev = self.solver.dev
        # Affine vectors scale linearly with the inlet amplitude.
        self.K1 = dev.k1[:, None] * self.amps[None, :]
        self.K3 = dev.k3[:, None] * self.amps[None, :]

    def initial_state(self) -> EnsembleState:
        return EnsembleState(
            u=jnp.zeros((self.solver.ndofs_u, self.B), jnp.float32),
            p=jnp.zeros((self.solver.ndofs_p, self.B), jnp.float32),
        )

    def evolve(self, state: EnsembleState, n_steps: int):
        """-> (state, drags (B, n), lifts (B, n))."""
        state, (d, l) = _evolve_ensemble(
            self.solver.dev, self.K1, self.K3, state, n_steps
        )
        return state, d.T, l.T
