"""Batched flows: many transient solves as one vmapped program.

The reference runs its mesh-resolution sweeps and multi-airfoil ground
truths strictly sequentially (one FEniCS solve per mesh, 54 CSV rows of
wall-clock each — SURVEY.md §6).  Here B independent flows become ONE
compiled program: each mesh's fused operators (solver/fused.py) are padded
to common dimensions and stacked, the IPCS step is vmapped over the leading
axis — every matvec becomes a batched matmul on the MXU — and the batch
axis can be sharded over a `jax.sharding.Mesh` so flows scale across chips
with zero communication (they are independent).

Zero-padding is exact: padded operator rows/columns are zero and padded
state entries start at zero, so they stay zero through the whole recursion.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import TriMesh
from ..ops.convection import ConvectionKernel
from .fused import FusedOperators, fused_step
from .ipcs import FlowState, IPCSConfig, IPCSSolver


def _pad_to(a: jnp.ndarray, shape) -> jnp.ndarray:
    pads = [(0, t - s) for s, t in zip(a.shape, shape)]
    return jnp.pad(a, pads)


def _stack_padded(arrays: Sequence[jnp.ndarray]) -> jnp.ndarray:
    if arrays[0].ndim == 0:
        return jnp.stack(arrays)
    target = tuple(max(a.shape[d] for a in arrays) for d in range(arrays[0].ndim))
    return jnp.stack([_pad_to(a, target) for a in arrays])


def _expand_vec2(v: jnp.ndarray, ns: int, ns_max: int) -> jnp.ndarray:
    """Re-layout a [x (ns) | y (ns)] vector into [x | 0 | y | 0] blocks of
    ns_max so the component split survives padding."""
    return jnp.concatenate(
        [_pad_to(v[:ns], (ns_max,)), _pad_to(v[ns:], (ns_max,))]
    )


def _expand_mat2(M: jnp.ndarray, ns: int, ns_max: int, axis: int) -> jnp.ndarray:
    """Apply the component-blocked re-layout along one axis of a matrix."""
    M = jnp.moveaxis(M, axis, 0)
    top, bot = M[:ns], M[ns:]
    pad_shape = (ns_max - ns,) + M.shape[1:]
    z = jnp.zeros(pad_shape, M.dtype)
    M = jnp.concatenate([top, z, bot, z])
    return jnp.moveaxis(M, 0, axis)


def stack_fused(devs: Sequence[FusedOperators]) -> FusedOperators:
    """Stack per-mesh fused operators into batched (B, ...) operators.

    Velocity vectors carry the block layout [x-dofs | y-dofs]
    (fem/spaces.py); every velocity-sized axis is padded PER COMPONENT so
    the split at Ns_max inside fused_step stays aligned for every mesh in
    the batch.
    """
    ns_list = [d.F3s.shape[0] for d in devs]
    ns_max = max(ns_list)

    def vec2(vs):
        return jnp.stack(
            [
                _pad_to(_expand_vec2(v, ns, ns_max), (2 * ns_max,))
                for v, ns in zip(vs, ns_list)
            ]
        )

    def mat2(ms, axes):
        out = []
        for m, ns in zip(ms, ns_list):
            for ax in axes:
                m = _expand_mat2(m, ns, ns_max, ax)
            out.append(m)
        return _stack_padded(out)

    convs = [d.conv for d in devs]
    # y-component cell dofs shift from +ns to +ns_max in the new layout.
    cell_dofs = _stack_padded(
        [
            jnp.concatenate(
                [c.cell_dofs[:, :6], c.cell_dofs[:, 6:] - ns + ns_max], axis=1
            )
            for c, ns in zip(convs, ns_list)
        ]
    )
    conv = ConvectionKernel(
        cell_dofs=cell_dofs,
        phi=convs[0].phi[None].repeat(len(convs), axis=0),
        gphys=_stack_padded([c.gphys for c in convs]),
        wdet=_stack_padded([c.wdet for c in convs]),  # zero wdet = inert cell
        ndofs=2 * ns_max,
    )
    return FusedOperators(
        F1u=mat2([d.F1u for d in devs], (0, 1)),
        F1p=mat2([d.F1p for d in devs], (0,)),
        A1Z=mat2([d.A1Z for d in devs], (0, 1)),
        k1=vec2([d.k1 for d in devs]),
        F2p=_stack_padded([d.F2p for d in devs]),
        F2u=mat2([d.F2u for d in devs], (1,)),
        k2=_stack_padded([d.k2 for d in devs]),
        F3s=_stack_padded([d.F3s for d in devs]),
        F3p=_stack_padded([d.F3p for d in devs]),
        k3=vec2([d.k3 for d in devs]),
        conv=conv,
        drag_u=vec2([d.drag_u for d in devs]),
        drag_p=_stack_padded([d.drag_p for d in devs]),
        lift_u=vec2([d.lift_u for d in devs]),
        lift_p=_stack_padded([d.lift_p for d in devs]),
        rho=jnp.stack([d.rho for d in devs]),
    )


class BatchedFlows:
    """B meshes, one vmapped fused IPCS program."""

    def __init__(self, meshes: Sequence[TriMesh], config: IPCSConfig | None = None):
        config = config or IPCSConfig(precision="f32", fused=True)
        if config.precision != "f32":
            raise ValueError("batched flows require the fused f32 path")
        config.fused = True
        self.solvers = [IPCSSolver(m, config) for m in meshes]
        self.dev = stack_fused([s.dev for s in self.solvers])
        self.B = len(meshes)
        self.n_u = self.dev.F1u.shape[1]
        self.n_p = self.dev.F2p.shape[1]

    def initial_state(self) -> FlowState:
        return FlowState(
            u=jnp.zeros((self.B, self.n_u), jnp.float32),
            p=jnp.zeros((self.B, self.n_p), jnp.float32),
        )

    def shard(self, mesh, axis: str = "dp"):
        """Shard the flow batch over a device mesh (pure data parallelism —
        independent flows, no collectives)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(axis))
        self.dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim > 0 else x,
            self.dev,
        )
        return self

    def evolve(self, state: FlowState, n_steps: int):
        """-> (state, drags (B, n), lifts (B, n))."""
        state, (d, l) = _evolve_batched(self.dev, state, n_steps)
        return state, d.T, l.T

    def solve(self, n_steps: int, save_steps: int | None = None):
        state = self.initial_state()
        save_steps = save_steps or n_steps
        assert n_steps % save_steps == 0
        drags, lifts, snaps = [], [], []
        for _ in range(n_steps // save_steps):
            state, d, l = self.evolve(state, save_steps)
            drags.append(d)
            lifts.append(l)
            snaps.append(state)
        drags = jnp.concatenate(drags, axis=1)  # (B, n_steps)
        lifts = jnp.concatenate(lifts, axis=1)
        return {
            "state": state,
            "drags": drags,
            "lifts": lifts,
            "snapshots": snaps,
            "snap_drags": np.asarray(drags.reshape(self.B, -1, save_steps)[:, :, -1]),
            "snap_lifts": np.asarray(lifts.reshape(self.B, -1, save_steps)[:, :, -1]),
        }


from functools import partial


@partial(jax.jit, static_argnames=("n_steps",))
def _evolve_batched(dev: FusedOperators, state: FlowState, n_steps: int):
    step = jax.vmap(fused_step)

    def body(s, _):
        return step(dev, s)

    return jax.lax.scan(body, state, None, length=n_steps)
