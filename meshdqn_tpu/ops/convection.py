"""Per-step convection assembly kernel: c(u)_[(a,i)] = (rho (u.grad)u, Phi_a).

The only nonlinear term in the IPCS step-1 RHS (flow_solver.py:107).  Runs on
device every time step: gather the 12 local velocity dofs per cell, evaluate
u and grad(u) at the quadrature points, contract with the test basis, and
segment-sum into the global vector.  All shapes static; vmap over cells.

Tabulation data is built once per mesh on host (ConvectionKernel.build).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.reference import dunavant_6, p2_basis, p2_grads
from ..fem.assembly import cell_jacobians
from ..fem.spaces import VectorP2Space
from ..mesh import TriMesh


@jax.tree_util.register_pytree_node_class
@dataclass
class ConvectionKernel:
    """Static per-mesh tabulation for the convection vector.

    cell_dofs : (C, 12) int32 — global dofs (6 x-comp, 6 y-comp)
    phi_w     : (Q, 6) f64 basis values (shared across cells)
    gphys     : (C, Q, 6, 2) f64 physical gradients
    wdet      : (C, Q) f64 quadrature weight * |det J|
    ndofs     : static output size (2 Ns)
    """

    cell_dofs: jnp.ndarray
    phi: jnp.ndarray
    gphys: jnp.ndarray
    wdet: jnp.ndarray
    ndofs: int

    def tree_flatten(self):
        return (self.cell_dofs, self.phi, self.gphys, self.wdet), self.ndofs

    @classmethod
    def tree_unflatten(cls, ndofs, children):
        return cls(*children, ndofs)

    @classmethod
    def build(
        cls,
        mesh: TriMesh,
        dtype=jnp.float64,
        ns_pad: int | None = None,
        dof_perm: np.ndarray | None = None,
        cells_pad: int = 0,
    ) -> "ConvectionKernel":
        """ns_pad: re-layout output dofs for a scalar block padded to ns_pad
        (solver pad_quantum): y-component dofs shift from +Ns to +ns_pad.
        dof_perm: old->new velocity dof map (e.g. the banded CG layout's
        interleaved RCM order); gather/scatter indices are remapped so the
        kernel consumes and produces vectors in the NEW layout.
        cells_pad: quantize the cell count up to a multiple by repeating
        cell 0's tabulation with wdet=0 — exact (each cell's contribution
        is scaled by wdet) and it keeps the evolve program's shapes stable
        across meshes in a pad_quantum bucket so removals don't recompile."""
        pts, w = dunavant_6()
        phi = p2_basis(pts)
        gref = p2_grads(pts)
        _, absdet, Jinv = cell_jacobians(mesh)
        gphys = np.einsum("qad,cde->cqae", gref, Jinv)
        wdet = w[None, :] * absdet[:, None]
        V = VectorP2Space(mesh)
        cell_dofs = np.asarray(V.cell_dofs())
        ndofs = V.ndofs
        if ns_pad is not None:
            ns = ndofs // 2
            cell_dofs = np.concatenate(
                [cell_dofs[:, :6], cell_dofs[:, 6:] - ns + ns_pad], axis=1
            )
            ndofs = 2 * ns_pad
        if dof_perm is not None:
            assert ns_pad is None, "dof_perm and ns_pad are exclusive"
            cell_dofs = np.asarray(dof_perm)[cell_dofs]
        if cells_pad:
            C = cell_dofs.shape[0]
            k = -(-C // cells_pad) * cells_pad - C
            if k:
                cell_dofs = np.concatenate(
                    [cell_dofs, np.repeat(cell_dofs[:1], k, axis=0)]
                )
                gphys = np.concatenate(
                    [gphys, np.repeat(gphys[:1], k, axis=0)]
                )
                wdet = np.concatenate(
                    [wdet, np.zeros((k, wdet.shape[1]), wdet.dtype)]
                )
        return cls(
            cell_dofs=jnp.asarray(cell_dofs),
            phi=jnp.asarray(phi, dtype=dtype),
            gphys=jnp.asarray(gphys, dtype=dtype),
            wdet=jnp.asarray(wdet, dtype=dtype),
            ndofs=ndofs,
        )

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return convection_vector(self, u)


@partial(jax.jit, static_argnames=())
def convection_vector(k: ConvectionKernel, u: jnp.ndarray) -> jnp.ndarray:
    """Assemble ((u.grad)u, v) for the velocity field u (2Ns,)."""
    Ue = u[k.cell_dofs]  # (C, 12)
    Ux, Uy = Ue[:, :6], Ue[:, 6:]
    # u at quadrature points: (C, Q)
    uxq = jnp.einsum("qa,ca->cq", k.phi, Ux)
    uyq = jnp.einsum("qa,ca->cq", k.phi, Uy)
    # grad u at quadrature points: du_i/dx_j -> (C, Q, j)
    dux = jnp.einsum("cqad,ca->cqd", k.gphys, Ux)  # (C,Q,2)
    duy = jnp.einsum("cqad,ca->cqd", k.gphys, Uy)
    # convection components (u . grad) u
    conv_x = uxq * dux[..., 0] + uyq * dux[..., 1]  # (C,Q)
    conv_y = uxq * duy[..., 0] + uyq * duy[..., 1]
    # element vectors: r[(a,i)] = sum_q wdet conv_i phi_a
    rx = jnp.einsum("cq,qa->ca", k.wdet * conv_x, k.phi)  # (C,6)
    ry = jnp.einsum("cq,qa->ca", k.wdet * conv_y, k.phi)
    relem = jnp.concatenate([rx, ry], axis=1)  # (C,12)
    return jax.ops.segment_sum(
        relem.ravel(), k.cell_dofs.ravel(), num_segments=k.ndofs
    )
