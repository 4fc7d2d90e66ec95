"""Cross-mesh solution transfer: point location + polynomial evaluation.

Reference semantics (Env2DAirfoil.py:547-593): after each coarsening the
S flow snapshots are re-interpolated from the ORIGINAL mesh onto the new mesh
(`Function.interpolate` with allow_extrapolation=True), i.e. every new dof
point is evaluated against the original P2/P1 polynomials; points that fall
outside the source mesh (e.g. edge midpoints cutting the carved airfoil hole)
are extrapolated from the nearest cell.

TPU-native design: the source mesh is frozen for a whole training job, so its
geometry (cell origins, inverse Jacobians, dof gathers) is tabulated once.
Point location is a brute-force vmap over cells — argmax of the minimum
barycentric coordinate — which both finds the containing cell when one exists
(min bary >= 0) and picks the least-violating (nearest in barycentric
defect) cell for exterior points, replacing FEniCS's BoundingBoxTree +
closest_entity path with one dense reduction that XLA fuses.  Target points
are padded to a static budget so the per-removal transfer never recompiles as
the mesh shrinks.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import cell_jacobians
from ..fem.spaces import P1Space, P2Space
from ..mesh import TriMesh


@jax.tree_util.register_pytree_node_class
@dataclass
class SourceField:
    """Frozen source-mesh tabulation for evaluating P2/P1 functions."""

    p0: jnp.ndarray  # (C,2) first-vertex coords
    Jinv: jnp.ndarray  # (C,2,2)
    cell_dofs_p2: jnp.ndarray  # (C,6)
    cell_dofs_p1: jnp.ndarray  # (C,3)
    ns: int  # scalar P2 dofs on source

    def tree_flatten(self):
        return (self.p0, self.Jinv, self.cell_dofs_p2, self.cell_dofs_p1), self.ns

    @classmethod
    def tree_unflatten(cls, ns, children):
        return cls(*children, ns)

    @classmethod
    def build(cls, mesh: TriMesh) -> "SourceField":
        _, _, Jinv = cell_jacobians(mesh)
        return cls(
            p0=jnp.asarray(mesh.coords[mesh.cells[:, 0]]),
            Jinv=jnp.asarray(Jinv),
            cell_dofs_p2=jnp.asarray(P2Space(mesh).cell_dofs()),
            cell_dofs_p1=jnp.asarray(P1Space(mesh).cell_dofs()),
            ns=P2Space(mesh).ndofs,
        )


@jax.jit
def locate(src: SourceField, points: jnp.ndarray):
    """For each point, the best cell and its reference coords.

    points: (P, 2).  Returns (cells (P,), xi (P, 2)).

    The O(P*C) candidate sweep runs in f32 — under x64 it would otherwise
    be the env hot path's dominant device cost (f64 is software-emulated
    on TPU and the (P, C, 2) intermediate is ~10^8 flops per env).  Cell
    CHOICE is all the sweep decides; near-edge f32 ties can pick either
    adjacent cell, and P2/P1 evaluation is continuous across shared edges,
    so the evaluated value is unaffected at f64 resolution.  The reference
    coordinates of the chosen cell are then recomputed at point precision
    (gathered rows only — O(P) work).
    """
    p32 = points.astype(jnp.float32)
    d = p32[:, None, :] - src.p0.astype(jnp.float32)[None, :, :]  # (P,C,2)
    # xi = Jinv @ (x - p0): contraction over Jinv's SECOND index (the
    # gradient path in fem/assembly.py contracts the first — that one is
    # Jinv^T by the chain rule; this one is Jinv itself).
    xi = jnp.einsum("pcd,ced->pce", d, src.Jinv.astype(jnp.float32))
    bary0 = 1.0 - xi[..., 0] - xi[..., 1]
    minb = jnp.minimum(bary0, jnp.minimum(xi[..., 0], xi[..., 1]))  # (P,C)
    cells = jnp.argmax(minb, axis=1)  # containing cell, or least-violating
    # exact reference coords from the chosen cell, at point precision
    xi_best = jnp.einsum(
        "pd,ped->pe", points - src.p0[cells], src.Jinv[cells]
    )
    return cells, xi_best


def _p2_basis_jnp(xi):
    x, y = xi[..., 0], xi[..., 1]
    l0 = 1.0 - x - y
    return jnp.stack(
        [
            l0 * (2 * l0 - 1),
            x * (2 * x - 1),
            y * (2 * y - 1),
            4 * x * y,
            4 * l0 * y,
            4 * l0 * x,
        ],
        axis=-1,
    )


def _p1_basis_jnp(xi):
    x, y = xi[..., 0], xi[..., 1]
    return jnp.stack([1.0 - x - y, x, y], axis=-1)


@jax.jit
def eval_p2_vector(src: SourceField, u: jnp.ndarray, points: jnp.ndarray):
    """Evaluate a block-layout vector P2 field at points -> (P, 2)."""
    cells, xi = locate(src, points)
    phi = _p2_basis_jnp(xi)  # (P,6)
    dofs = src.cell_dofs_p2[cells]  # (P,6)
    ux = jnp.sum(phi * u[dofs], axis=1)
    uy = jnp.sum(phi * u[src.ns + dofs], axis=1)
    return jnp.stack([ux, uy], axis=1)


@jax.jit
def eval_p1(src: SourceField, p: jnp.ndarray, points: jnp.ndarray):
    """Evaluate a P1 field at points -> (P,)."""
    cells, xi = locate(src, points)
    phi = _p1_basis_jnp(xi)
    return jnp.sum(phi * p[src.cell_dofs_p1[cells]], axis=1)


@jax.jit
def _eval_all(src: SourceField, u_all: jnp.ndarray, p_all: jnp.ndarray,
              pts: jnp.ndarray):
    """Evaluate S vector-P2 fields and S P1 fields at shared points.

    u_all: (S, 2Ns), p_all: (S, Np), pts: (P, 2).
    Returns (S, P, 2) velocities and (S, P) pressures.
    """
    cells, xi = locate(src, pts)
    phi2 = _p2_basis_jnp(xi)  # (P, 6)
    dofs2 = src.cell_dofs_p2[cells]  # (P, 6)
    ux = jnp.einsum("pa,spa->sp", phi2, u_all[:, dofs2])
    uy = jnp.einsum("pa,spa->sp", phi2, u_all[:, src.ns + dofs2])
    phi1 = _p1_basis_jnp(xi)  # (P, 3)
    dofs1 = src.cell_dofs_p1[cells]
    pv = jnp.einsum("pa,spa->sp", phi1, p_all[:, dofs1])
    return jnp.stack([ux, uy], axis=-1), pv


@jax.jit
def _step_products(src: SourceField, u_all, p_all, pts, probe_u, probe_p, widx):
    """One fused device pass per mesh change (the env hot path).

    Interpolates all S snapshots onto the padded target dof points,
    integrates the (padded) drag/lift functionals, gathers the observation
    window's vertex features, and computes a finiteness flag — so the host
    reads back ONE small vector per step instead of the full snapshot set
    (the round-trip readback was >70% of env.step wall time on the
    remote-TPU link).

    probe_u: (2, 2, P) [drag,lift][x,y] zero-padded velocity functionals;
    probe_p: (2, P) pressure functionals; widx: (W,) window vertex indices
    (vertices are the first points of `pts`).

    Returns (uv (S,P,2), pv (S,P), small) where small packs
    [finite, drags (S,), lifts (S,), vel_w (S,W,2), p_w (S,W)] as one f32
    vector for a single host readback.
    """
    uv, pv = _eval_all(src, u_all, p_all, pts)
    finite = jnp.isfinite(uv).all() & jnp.isfinite(pv).all()
    forces = jnp.einsum("spc,fcp->fs", uv, probe_u) + jnp.einsum(
        "sp,fp->fs", pv, probe_p
    )  # (2, S)
    vel_w = jnp.take(uv, widx, axis=1)  # (S, W, 2)
    p_w = jnp.take(pv, widx, axis=1)  # (S, W)
    small = jnp.concatenate(
        [
            finite.astype(jnp.float32)[None],
            forces.reshape(-1).astype(jnp.float32),
            vel_w.reshape(-1).astype(jnp.float32),
            p_w.reshape(-1).astype(jnp.float32),
        ]
    )
    return uv, pv, small


# Batched-over-envs variants: the source field/snapshots are shared; the
# per-env padded inputs get a leading batch axis.  Batch size is padded to
# the trainer's num_parallel so the module compiles once.
_step_products_batched = jax.jit(
    jax.vmap(_step_products, in_axes=(None, None, None, 0, 0, 0, 0))
)


@jax.jit
def _step_products_batched_f32wire(src, u_all, p_all, pts32, pu32, pp32, widx):
    """f32-wire variant: inputs are shipped as f32 and cast to f64 ON
    DEVICE.  The per-removal payload (pts + probe functionals, ~9P doubles
    per env) dominates the sweep's host->device bytes; halving it matters
    both for tunnel upload time and for the axon client's H2D retention
    (docs/AXON.md).  Accuracy: the env only consumes the f32-packed `small`
    readback, so f32-rounding the inputs (~6e-8 rel) is invisible next to
    the readback's own f32 rounding; the f64 on-device accumulation is kept.
    Batch size is quantized by the caller (a few compiled variants) instead
    of always padding to num_parallel — fewer shipped bytes AND fewer
    padded compute rows when few envs remove."""
    return _step_products_batched(
        src, u_all, p_all,
        pts32.astype(jnp.float64),
        pu32.astype(jnp.float64),
        pp32.astype(jnp.float64),
        widx,
    )


@jax.jit
def _gather_window(uv, pv, widx):
    """Window-feature gather from device-resident interpolants (the
    do-nothing/window-shift path: no re-interpolation needed)."""
    vel_w = jnp.take(uv, widx, axis=1)
    p_w = jnp.take(pv, widx, axis=1)
    return jnp.concatenate(
        [vel_w.reshape(-1).astype(jnp.float32), p_w.reshape(-1).astype(jnp.float32)]
    )


_gather_window_batched = jax.jit(jax.vmap(_gather_window))


# ----------------------------------------------------------------------
# Snapshot transfer onto a (coarsened) target mesh
# ----------------------------------------------------------------------

@dataclass
class SnapshotSet:
    """S flow snapshots on one mesh: u (S, 2Ns), p (S, Np)."""

    u: np.ndarray
    p: np.ndarray

    @property
    def num_snapshots(self) -> int:
        return len(self.u)


class SnapshotTransfer:
    """Interpolates snapshots from a frozen source mesh onto target meshes.

    Mirrors _check_mesh's interpolation loop (Env2DAirfoil.py:556-568) but
    batched: all snapshots and all target dof points evaluated in one
    device call each.
    """

    def __init__(
        self,
        source_mesh: TriMesh,
        snapshots: SnapshotSet,
        window_budget: int = 180,
    ):
        self.src = SourceField.build(source_mesh)
        self.u_src = jnp.asarray(np.stack(snapshots.u))  # (S, 2Ns)
        self.p_src = jnp.asarray(np.stack(snapshots.p))  # (S, Np)
        # Static padded target budgets: coarsening only shrinks the mesh, so
        # the source sizes bound every target — evaluation never recompiles
        # as the episode progresses.
        self._budget2 = P2Space(source_mesh).ndofs
        self._budget1 = source_mesh.num_vertices
        # Observation-window budget (N_closest) for the fused feature gather.
        self.window_budget = window_budget

    def _padded(self, pts: np.ndarray, budget: int) -> jnp.ndarray:
        n = len(pts)
        if n > budget:  # target grew beyond the source (not the MeshDQN
            return jnp.asarray(pts)  # flow); evaluate unpadded
        out = np.zeros((budget, 2))
        out[:n] = pts
        return jnp.asarray(out)

    def to_mesh(self, target: TriMesh) -> SnapshotSet:
        """Interpolate all snapshots onto `target`'s P2/P1 dofs.

        One point-location pass serves everything: the P1 dof points
        (vertices) are exactly the first V entries of the P2 dof points, and
        location is field-independent, so all S velocity and S pressure
        fields share a single locate() over the padded P2 points.
        """
        Vs = P2Space(target)
        n2 = Vs.ndofs
        n1 = target.num_vertices
        pts2 = self._padded(Vs.dof_coords(), self._budget2)
        uv, pv = _eval_all(self.src, self.u_src, self.p_src, pts2)
        uv = np.asarray(uv)[:, :n2, :]  # (S, Ns_t, 2)
        u_new = np.concatenate([uv[..., 0], uv[..., 1]], axis=1)
        p_new = np.asarray(pv)[:, :n1]
        return SnapshotSet(u=u_new, p=p_new)

    def step_inputs(self, target: TriMesh, window: np.ndarray, dprobe, lprobe):
        """Host-side inputs for the fused per-removal device pass — split
        out so a trainer can STACK many envs' inputs into one batched call
        (one tunnel round-trip for the whole sweep)."""
        Vs = P2Space(target)
        n2, n1 = Vs.ndofs, target.num_vertices
        P = max(self._budget2, n2)
        pts = np.zeros((P, 2))
        pts[:n2] = Vs.dof_coords()

        probe_u = np.zeros((2, 2, P))
        probe_p = np.zeros((2, P))
        for f, pr in enumerate((dprobe, lprobe)):
            probe_u[f, 0, :n2] = pr.d_u[:n2]
            probe_u[f, 1, :n2] = pr.d_u[n2:]
            probe_p[f, :n1] = pr.d_p

        W = self.window_budget
        widx = np.zeros(W, dtype=np.int32)
        widx[: len(window)] = window
        return {
            "pts": pts,
            "probe_u": probe_u,
            "probe_p": probe_p,
            "widx": widx,
            "n1": n1,
            "n2": n2,
            "k": len(window),
        }

    def _parse_small(self, small: np.ndarray, k: int):
        S = len(self.u_src)
        W = self.window_budget
        finite = bool(small[0])
        drags = small[1 : 1 + S].astype(np.float64)
        lifts = small[1 + S : 1 + 2 * S].astype(np.float64)
        off = 1 + 2 * S
        vel_w = small[off : off + S * W * 2].reshape(S, W, 2)[:, :k]
        p_w = small[off + S * W * 2 :].reshape(S, W)[:, :k]
        return finite, drags, lifts, vel_w, p_w

    def step_products(self, target: TriMesh, window: np.ndarray, dprobe, lprobe):
        """Fused per-removal device pass: interpolate + probes + window
        features, ONE small host readback (see _step_products).

        Returns (dev_snaps, finite, drags (S,), lifts (S,), vel_w (S,k,2),
        p_w (S,k)) where dev_snaps = (uv, pv, n1, n2) stays on device,
        padded; k = len(window).
        """
        inp = self.step_inputs(target, window, dprobe, lprobe)
        return self.step_products_from_inputs(inp)

    def step_products_from_inputs(self, inp: dict):
        """Solo fused pass from prepared step_inputs (same contract as
        step_products)."""
        uv, pv, small = _step_products(
            self.src,
            self.u_src,
            self.p_src,
            jnp.asarray(inp["pts"]),
            jnp.asarray(inp["probe_u"], jnp.float64),
            jnp.asarray(inp["probe_p"], jnp.float64),
            jnp.asarray(inp["widx"]),
        )
        small = np.asarray(small)  # the ONE readback
        parsed = self._parse_small(small, inp["k"])
        return (uv, pv, inp["n1"], inp["n2"]), *parsed

    def run_products_batched(
        self, inputs: list[dict], pad_to: int, wire: str = "f64"
    ):
        """Run MANY envs' fused passes as one vmapped call padded to a
        static batch size (so the sweep never recompiles as the number of
        removing envs varies), with ONE host readback for all of them.

        wire='f32' ships the padded inputs as f32 (cast to f64 on device,
        see _step_products_batched_f32wire) and quantizes the batch to the
        next power of two >= len(inputs) instead of always padding to
        `pad_to` — a handful of compiled variants in exchange for ~2x fewer
        shipped bytes and fewer padded compute rows.

        Returns a list of (dev_snaps, finite, drags, lifts, vel_w, p_w) in
        input order.
        """
        return self.run_products_batched_finish(
            self.run_products_batched_begin(inputs, pad_to, wire)
        )

    def run_products_batched_begin(
        self, inputs: list[dict], pad_to: int, wire: str = "f64"
    ):
        """Dispatch half of run_products_batched: enqueue the device call
        and return a handle WITHOUT the host readback.  Lets the caller
        overlap this call's device execution/readback with other
        independent device work on a high-latency link (the trainer sweep
        overlaps it with the window-feature gather — the two round-trips
        pipeline instead of serializing)."""
        assert inputs and len(inputs) <= pad_to
        if wire == "f32":
            kq = 4
            while kq < len(inputs):
                kq *= 2
            kq = min(kq, pad_to)
            padded = inputs + [inputs[0]] * (kq - len(inputs))
            stk = lambda key, dt: jnp.asarray(  # noqa: E731
                np.stack([i[key] for i in padded]).astype(dt)
            )
            uv, pv, small = _step_products_batched_f32wire(
                self.src,
                self.u_src,
                self.p_src,
                stk("pts", np.float32),
                stk("probe_u", np.float32),
                stk("probe_p", np.float32),
                stk("widx", np.int32),
            )
        else:
            padded = inputs + [inputs[0]] * (pad_to - len(inputs))
            stk = lambda key, dt=None: jnp.asarray(  # noqa: E731
                np.stack([i[key] for i in padded]), dt
            )
            uv, pv, small = _step_products_batched(
                self.src,
                self.u_src,
                self.p_src,
                stk("pts"),
                stk("probe_u", jnp.float64),
                stk("probe_p", jnp.float64),
                stk("widx"),
            )
        return (uv, pv, small, list(inputs))

    def run_products_batched_finish(self, handle):
        """Readback half of run_products_batched (see _begin)."""
        uv, pv, small, inputs = handle
        smalls = np.asarray(small)  # ONE readback for the whole sweep
        out = []
        for b, inp in enumerate(inputs):
            dev = (uv[b], pv[b], inp["n1"], inp["n2"])
            out.append((dev, *self._parse_small(smalls[b], inp["k"])))
        return out

    def gather_window_batched(self, items: list[tuple], pad_to: int | None = None):
        """Batched window-feature gather for window-shift steps:
        items = [(dev_snaps, window), ...] -> [(vel_w, p_w), ...].
        Padded to a static batch size so the module compiles once."""
        return self.gather_window_batched_finish(
            self.gather_window_batched_begin(items, pad_to)
        )

    def gather_window_batched_begin(
        self, items: list[tuple], pad_to: int | None = None
    ):
        """Dispatch half of gather_window_batched (no host readback)."""
        pad_to = pad_to or len(items)
        padded = items + [items[0]] * (pad_to - len(items))
        uv = jnp.stack([d[0] for d, _ in padded])
        pv = jnp.stack([d[1] for d, _ in padded])
        W = self.window_budget
        widx = np.zeros((pad_to, W), dtype=np.int32)
        for b, (_, window) in enumerate(padded):
            widx[b, : len(window)] = window
        small = _gather_window_batched(uv, pv, jnp.asarray(widx))
        return (small, list(items))

    def gather_window_batched_finish(self, handle):
        """Readback half of gather_window_batched (see _begin)."""
        small, items = handle
        smalls = np.asarray(small)
        S = len(self.u_src)
        W = self.window_budget
        out = []
        for b, (_, window) in enumerate(items):
            k = len(window)
            vel_w = smalls[b, : S * W * 2].reshape(S, W, 2)[:, :k]
            p_w = smalls[b, S * W * 2 :].reshape(S, W)[:, :k]
            out.append((vel_w, p_w))
        return out

    def gather_window(self, dev_snaps, window: np.ndarray):
        """Window features from device-resident interpolants (window-shift
        steps: the mesh — hence the interpolation — is unchanged)."""
        uv, pv, n1, n2 = dev_snaps
        W = self.window_budget
        k = len(window)
        widx = np.zeros(W, dtype=np.int32)
        widx[:k] = window
        S = len(self.u_src)
        small = np.asarray(_gather_window(uv, pv, jnp.asarray(widx)))
        vel_w = small[: S * W * 2].reshape(S, W, 2)[:, :k]
        p_w = small[S * W * 2 :].reshape(S, W)[:, :k]
        return vel_w, p_w

    def materialize(self, dev_snaps) -> SnapshotSet:
        """Read device-resident interpolants back as an unpadded
        SnapshotSet (plotting / artifact paths only)."""
        uv, pv, n1, n2 = dev_snaps
        uvn = np.asarray(uv)[:, :n2, :]
        return SnapshotSet(
            u=np.concatenate([uvn[..., 0], uvn[..., 1]], axis=1),
            p=np.asarray(pv)[:, :n1],
        )

    def vertex_fields(self, target: TriMesh, snaps: SnapshotSet):
        """velocities (S, V, 2) and pressures (S, V) at target vertices.

        For nodal P2/P1, function values at vertices ARE the vertex dofs, so
        this replaces the reference's per-point re-evaluation loop
        (_calculate_velocities/_calculate_pressures, Env2DAirfoil.py:515-522)
        with slicing.
        """
        V = target.num_vertices
        Ns = P2Space(target).ndofs
        vel = np.stack([snaps.u[:, :V], snaps.u[:, Ns : Ns + V]], axis=2)
        return vel, snaps.p[:, :V]
