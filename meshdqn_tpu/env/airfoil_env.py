"""RL environment: coarsen the airfoil mesh while preserving drag/lift.

Re-design of the reference's Env2DAirfoil (Env2DAirfoil.py:42-602) with the
same MDP semantics:

* one ground-truth transient solve up front produces S flow snapshots and
  their drag/lift values (Env2DAirfoil.py:111-125);
* an episode step removes one mesh vertex (or shifts the observation window
  for the "do nothing" action, :330-331), re-triangulates, interpolates the
  ORIGINAL snapshots onto the new mesh, and re-integrates the force probes —
  no further simulation (:380-428);
* observation = graph over the N_closest removable vertices nearest the
  airfoil (:293-315);
* reward = 2 exp(-K err) - 1 + removals * time_reward with
  K = -2 ln(0.5)/threshold, err the 2-norm of per-snapshot relative drag
  errors (:407-414); -1 and termination on a broken mesh;
* episode ends when any snapshot's drag error exceeds `threshold`, the
  vertex count drops below goal_vertices * V0, timesteps run out, or the
  mesh breaks (:417-428, :368-369).

Faithful-bug policy (SURVEY.md §2a): on accuracy/vertex-floor termination
the reference *intends* a -0.5 reward but assigns it to a dead attribute and
returns the ordinary reward (Env2DAirfoil.py:349); `terminal_penalty=False`
(default) reproduces that, True applies the intended -0.5.

Host/device split: re-triangulation (scipy Delaunay) and bookkeeping live on
host; interpolation, probe integration and observation features are device
code with static shapes.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..coarsen import RemovalStatus, remove_vertex
from ..mesh import TriMesh, airfoil_polyline, mark_boundaries, read_xdmf, smooth
from ..probes import force_probes
from ..solver import IPCSConfig, IPCSSolver
from ..transfer import SnapshotSet, SnapshotTransfer
from ..utils import Config
from .graph import GraphState, build_graph_state, polyline_distance

NEGATIVE_REWARD = -1.0


@dataclass
class GroundTruth:
    """Frozen products of the one-time ground-truth solve."""

    mesh: TriMesh  # the (smoothed) simulation mesh
    snapshots: SnapshotSet  # S snapshots of (u, p) on `mesh`
    gt_drag: np.ndarray  # (S,)
    gt_lift: np.ndarray  # (S,)
    # Wall-clock of the ground-truth solve.  The reference carries a
    # `gt_time` config slot that is never actually measured and stays -1
    # forever (SURVEY.md §2a known defects); here it is real.
    gt_time: float = -1.0

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            coords=self.mesh.coords,
            cells=self.mesh.cells,
            u=self.snapshots.u,
            p=self.snapshots.p,
            gt_drag=self.gt_drag,
            gt_lift=self.gt_lift,
            gt_time=np.asarray(self.gt_time),
        )

    @classmethod
    def load(cls, path: str) -> "GroundTruth":
        z = np.load(path)
        return cls(
            mesh=TriMesh(coords=z["coords"], cells=z["cells"]),
            snapshots=SnapshotSet(u=z["u"], p=z["p"]),
            gt_drag=z["gt_drag"],
            gt_lift=z["gt_lift"],
            gt_time=float(z["gt_time"]) if "gt_time" in z else -1.0,
        )


def compute_ground_truth(config: Config) -> GroundTruth:
    """Run the up-front transient solve (Env2DAirfoil.py:111-125)."""
    mesh = read_xdmf(config.flow.mesh)
    if config.flow.smooth:
        mesh = smooth(mesh, 50)
    solver = IPCSSolver(
        mesh,
        IPCSConfig(
            mu=config.flow.mu,
            rho=config.flow.rho,
            dt=config.flow.dt,
            precision=config.flow.precision,
            refine_iters=config.flow.refine_iters,
        ),
    )
    import time as _time

    t0 = _time.time()
    out = solver.solve(config.agent.solver_steps, save_steps=config.agent.save_steps)
    gt_time = _time.time() - t0
    u = np.stack([np.asarray(s.u) for s in out["snapshots"]])
    p = np.stack([np.asarray(s.p) for s in out["snapshots"]])
    return GroundTruth(
        mesh=mesh,
        snapshots=SnapshotSet(u=u, p=p),
        gt_drag=out["snap_drags"],
        gt_lift=out["snap_lifts"],
        gt_time=gt_time,
    )


@dataclass
class StepInfo:
    removed: int  # RemovalStatus-compatible code
    drags: np.ndarray | None = None
    lifts: np.ndarray | None = None
    num_vertices: int = 0
    broken: bool = False
    terminal_reason: str = ""


@dataclass
class StepPrep:
    """Output of the host phase of a step (prepare_step), consumed by
    complete_step after the (possibly batched) fused device pass."""

    action: int
    info: StepInfo
    kind: str = "nothing"  # 'remove' | 'nothing'
    status: int = 0  # removal status known so far
    pending: dict | None = None  # commit payload for a successful removal
    inputs: dict | None = None  # device-call inputs (transfer.step_inputs)
    post_window: np.ndarray | None = None  # window for a batched gather


class AirfoilEnv:
    """gym-style Env: reset() -> obs; step(a) -> (obs, reward, done, info)."""

    def __init__(
        self,
        config: Config,
        ground_truth: GroundTruth | None = None,
        transfer: SnapshotTransfer | None = None,
    ):
        self.config = config
        if ground_truth is None:
            ground_truth = compute_ground_truth(config)
        self.gt = ground_truth

        agent = config.agent
        self.n_closest = agent.N_closest
        self.action_space_n = agent.N_closest  # actions 0..N-1 remove; N = shift
        # gym-style shim (`env.action_space.n`, Env2DAirfoil.py:68) without a
        # gym dependency.
        from types import SimpleNamespace

        self.action_space = SimpleNamespace(n=agent.N_closest)
        self.threshold = agent.threshold
        self.time_reward = agent.time_reward
        self.timesteps = agent.timesteps
        self.goal_vertices = agent.goal_vertices
        self.edge_budget = agent.edge_budget
        self.terminal_penalty = agent.terminal_penalty

        # Fixed across the whole job:
        self.initial_num_nodes = ground_truth.mesh.num_vertices
        self.transfer = transfer or SnapshotTransfer(
            ground_truth.mesh,
            ground_truth.snapshots,
            window_budget=agent.N_closest,
        )
        # Airfoil ring from the ORIGINAL mesh — the reference builds its
        # polygon once and reuses it (Env2DAirfoil.py:223-233).
        self.ring = airfoil_polyline(ground_truth.mesh)
        self.gt_drag = np.asarray(ground_truth.gt_drag, dtype=np.float64)
        self.gt_lift = np.asarray(ground_truth.gt_lift, dtype=np.float64)
        self.gt_time = ground_truth.gt_time

        self.reset()

    def return_vals(self):
        """(gt_drag, gt_time) — Env2DAirfoil.py:167-168, with gt_time
        actually measured (the reference leaves it at -1)."""
        return self.gt_drag, self.gt_time

    def set_plot_dir(self, plot_dir: str):
        """Create the run directory and persist the snapshot artifacts
        (Env2DAirfoil.py:432-449): velocities/pressures vertex fields plus
        the raw dof vectors, in the reference's snapshots/ layout, and the
        consolidated ground_truth.npz."""
        import os

        self.plot_dir = plot_dir
        os.makedirs(plot_dir, exist_ok=True)
        snap_dir = os.path.join(plot_dir, "snapshots")
        os.makedirs(snap_dir, exist_ok=True)
        np.save(os.path.join(snap_dir, "velocities.npy"), self.velocities)
        np.save(
            os.path.join(snap_dir, "pressures.npy"), self.pressures[:, :, None]
        )
        np.save(os.path.join(snap_dir, "save_velocities.npy"), self.gt.snapshots.u)
        np.save(os.path.join(snap_dir, "save_pressures.npy"), self.gt.snapshots.p)
        self.gt.save(os.path.join(plot_dir, "ground_truth.npz"))

    def plot_state(self, title="{}", filename="initial_state"):
        """Observation-window plot (Env2DAirfoil.py:171-217)."""
        from ..deploy.viz import plot_state as _plot_state

        _plot_state(
            self, title=title, filename=filename,
            plot_dir=getattr(self, "plot_dir", "."),
        )

    # ------------------------------------------------------------------
    def reset(self) -> GraphState:
        self.mesh = self.gt.mesh
        # At reset the snapshots ARE the (host) ground-truth arrays; after a
        # removal they live on device, padded (self._dev_snaps), and are
        # materialized lazily only for plotting/artifact paths.
        self._dev_snaps = None
        self._snaps_np = self.gt.snapshots
        self._vfields = None
        self._cached_state_inputs = None
        self._last_state_inputs = None
        self._refresh_mesh_products()
        # Initial probe values: cheap host dots on the numpy GT snapshots
        # (identical to the ground-truth integration on the same mesh).
        self.new_drags = np.array(
            [
                self._drag_probe.sample(u, p)
                for u, p in zip(self._snaps_np.u, self._snaps_np.p)
            ]
        )
        self.new_lifts = np.array(
            [
                self._lift_probe.sample(u, p)
                for u, p in zip(self._snaps_np.u, self._snaps_np.p)
            ]
        )
        self.steps = 0
        self.do_nothing_offset = 0
        self.terminal = False
        self.out_of_vertices = False
        self.removed_coordinates: list[np.ndarray] = []
        return self.get_state()

    def _refresh_mesh_products(self):
        """Per-mesh derived data: markers, probes, removable set."""
        self.markers = mark_boundaries(self.mesh)
        mu = self.config.flow.mu
        self._drag_probe, self._lift_probe = force_probes(self.mesh, self.markers, mu)
        self.removable = np.flatnonzero(~self.mesh.boundary_vertex_mask)

    # --- lazy snapshot views (plotting / artifact paths only) ----------
    @property
    def snaps(self) -> SnapshotSet:
        if self._snaps_np is None:
            self._snaps_np = self.transfer.materialize(self._dev_snaps)
        return self._snaps_np

    def _vertex_fields(self):
        if self._vfields is None:
            self._vfields = self.transfer.vertex_fields(self.mesh, self.snaps)
        return self._vfields

    @property
    def velocities(self):
        return self._vertex_fields()[0]

    @property
    def pressures(self):
        return self._vertex_fields()[1]

    # ------------------------------------------------------------------
    def _window_for(self, mesh: TriMesh, removable: np.ndarray):
        """The N_closest removable vertices nearest the airfoil, shifted by
        the do-nothing offset (Env2DAirfoil.py:293-315)."""
        d = polyline_distance(mesh.coords[removable], self.ring)
        order = np.argsort(d, kind="stable")
        sel = order[self.do_nothing_offset : self.n_closest + self.do_nothing_offset]
        return removable[sel], len(sel) < self.n_closest

    def _window(self) -> np.ndarray:
        window, oov = self._window_for(self.mesh, self.removable)
        if oov:
            self.out_of_vertices = True
        return window

    def get_state(self) -> GraphState:
        if self._cached_state_inputs is not None:
            # A successful removal already computed the new window and its
            # features inside the fused device pass.
            window, vel_w, p_w = self._cached_state_inputs
            self._cached_state_inputs = None
        else:
            window = self._window()
            if self._dev_snaps is not None:
                vel_w, p_w = self.transfer.gather_window(self._dev_snaps, window)
            else:
                vel, pres = self._vertex_fields()
                vel_w, p_w = vel[:, window, :], pres[:, window]
        self._current_window = window
        self._last_state_inputs = (window, vel_w, p_w)
        return build_graph_state(
            self.mesh.coords,
            self.mesh.cells,
            window,
            vel_w,
            p_w,
            self.n_closest,
            self.edge_budget,
        )

    # ------------------------------------------------------------------
    # The step is split into a host phase (prepare_step: mesh surgery,
    # probe assembly, window search) and a completion phase so a trainer
    # can run MANY envs' fused device passes as one batched call between
    # the two (Trainer._sweep); step() composes them for single-env use.
    def step(self, action: int):
        prep = self.prepare_step(action)
        result = None
        if prep.inputs is not None:
            try:
                result = self.transfer.step_products_from_inputs(prep.inputs)
            except Exception:
                result = None  # rollback in complete_step
        if prep.post_window is not None:
            # Do-nothing path: reuse the window prepare_step already
            # computed (the Trainer does the same via a batched gather);
            # otherwise get_state would recompute it from scratch.
            vel_w, p_w = self.transfer.gather_window(
                self._dev_snaps, prep.post_window
            )
            self._cached_state_inputs = (prep.post_window, vel_w, p_w)
        return self.complete_step(prep, result)

    def prepare_step(self, action: int) -> "StepPrep":
        info = StepInfo(removed=0, num_vertices=self.mesh.num_vertices)
        prep = StepPrep(action=action, info=info)
        if action == self.action_space_n:
            # Do-nothing: shift the window (Env2DAirfoil.py:330-331).
            self.do_nothing_offset += 1
            prep.kind = "nothing"
            if self._dev_snaps is not None:
                # Post-shift window for the (batchable) feature gather.
                prep.post_window = self._window()
        else:
            prep.kind = "remove"
            prep.status, prep.pending = self._begin_remove(action)
            if prep.pending is not None:
                prep.inputs = prep.pending["inputs"]
        return prep

    def complete_step(self, prep: "StepPrep", result=None):
        info = prep.info
        removed = prep.status
        if prep.kind == "remove" and removed == 0:
            removed = self._commit_remove(prep.pending, result)
        info.removed = removed

        # Feature reuse for unchanged-mesh outcomes: a failed removal leaves
        # both the mesh and the window untouched, so the previous state's
        # features are exactly correct (no device work).
        if (
            self._cached_state_inputs is None
            and prep.kind == "remove"
            and removed != 0
            and self._last_state_inputs is not None
        ):
            self._cached_state_inputs = self._last_state_inputs

        state = self.get_state()
        broken = False
        if self.out_of_vertices:
            removed = 2
            info.terminal_reason = "out_of_vertices"

        if removed == 0:
            rew, broken, self.terminal = self.calculate_reward(info)
            if self.terminal and self.terminal_penalty:
                rew = 0.5 * NEGATIVE_REWARD
            if broken:
                rew = NEGATIVE_REWARD
                self.terminal = True
        elif removed == 1:
            rew = NEGATIVE_REWARD
        else:  # removed == 2
            rew = NEGATIVE_REWARD
            self.terminal = True
            broken = True
            info.terminal_reason = info.terminal_reason or "broken_mesh"

        self.steps += 1
        if self.steps >= self.timesteps:
            self.terminal = True
            info.terminal_reason = info.terminal_reason or "timesteps"

        if np.isnan(rew):
            rew = NEGATIVE_REWARD

        info.broken = broken
        info.num_vertices = self.mesh.num_vertices
        return state, float(rew), self.terminal, info

    # ------------------------------------------------------------------
    _SNAPSHOT_FIELDS = (
        "mesh", "markers", "_drag_probe", "_lift_probe", "removable",
        "_dev_snaps", "_snaps_np", "_vfields", "new_drags", "new_lifts",
        "_cached_state_inputs", "_last_state_inputs", "_current_window",
        "out_of_vertices", "do_nothing_offset", "steps", "terminal",
    )

    def snapshot_state(self) -> dict:
        """Capture the env's mutable per-episode state so a committed step
        can be undone externally (deploy --verified: a removal whose FULL
        re-simulation breaches the threshold is rolled back even though the
        interpolated estimate accepted it).  Shallow references suffice:
        every step path REPLACES these fields rather than mutating them;
        the one mutated list is copied."""
        snap = {f: getattr(self, f, None) for f in self._SNAPSHOT_FIELDS}
        snap["removed_coordinates"] = list(self.removed_coordinates)
        return snap

    def restore_state(self, snap: dict) -> None:
        """Inverse of snapshot_state (an extension beyond the reference,
        whose deployer only tracks a best_mesh and never backtracks —
        deploy_dqn.py:420-424)."""
        for f in self._SNAPSHOT_FIELDS:
            setattr(self, f, snap[f])
        self.removed_coordinates = list(snap["removed_coordinates"])

    # ------------------------------------------------------------------
    def _begin_remove(self, action: int):
        """Host phase of a removal: mesh surgery + per-mesh products +
        device-call inputs.  Returns (status, pending); pending is None
        unless status == 0 (device pass still required)."""
        window = getattr(self, "_current_window", None)
        if window is None:
            window = self._window()
        if action >= len(window):
            return 2, None  # ran out of vertices (Env2DAirfoil.py:456-458)
        vertex = int(window[action])

        res = remove_vertex(
            self.mesh,
            vertex,
            removable_mask=~self.mesh.boundary_vertex_mask,
            backend=(
                "cavity"
                if self.config.flow.retriangulation == "cavity"
                else "auto"
            ),
        )
        if res.status != RemovalStatus.OK:
            return int(res.status), None

        new_mesh = res.mesh
        # remesh(): smooth again on every remesh (flow_solver.py:236-237).
        if self.config.flow.smooth:
            new_mesh = smooth(new_mesh, 50)

        # Host-side per-mesh products; the fused device pass (interpolation
        # of the ORIGINAL snapshots per Env2DAirfoil.py:556-568, probe
        # integration, window features, finiteness) runs between
        # prepare_step and complete_step — solo or batched across envs.
        mu = self.config.flow.mu
        markers = mark_boundaries(new_mesh)
        dprobe, lprobe = force_probes(new_mesh, markers, mu)
        removable = np.flatnonzero(~new_mesh.boundary_vertex_mask)
        new_window, oov = self._window_for(new_mesh, removable)
        try:
            inputs = self.transfer.step_inputs(new_mesh, new_window, dprobe, lprobe)
        except Exception:
            return 2, None
        return 0, {
            "mesh": new_mesh,
            "markers": markers,
            "dprobe": dprobe,
            "lprobe": lprobe,
            "removable": removable,
            "window": new_window,
            "oov": oov,
            "removed_coordinate": res.removed_coordinate,
            "inputs": inputs,
        }

    def _commit_remove(self, pending: dict, result) -> int:
        """Completion phase: inspect the device pass result, commit or
        roll back (the rollback is simply not committing — all pending
        state is local)."""
        if result is None:
            return 2  # "INTERPOLATION BROKE" path -> rollback
        dev_snaps, finite, drags, lifts, vel_w, p_w = result
        if not finite:
            return 2

        self.removed_coordinates.append(pending["removed_coordinate"])
        self.mesh = pending["mesh"]
        self.markers = pending["markers"]
        self._drag_probe, self._lift_probe = pending["dprobe"], pending["lprobe"]
        self.removable = pending["removable"]
        self._dev_snaps = dev_snaps
        self._snaps_np = None
        self._vfields = None
        self.new_drags, self.new_lifts = drags, lifts
        self._cached_state_inputs = (pending["window"], vel_w, p_w)
        if pending["oov"]:
            self.out_of_vertices = True
        return 0

    # ------------------------------------------------------------------
    def calculate_reward(self, info: StepInfo | None = None):
        """(reward, broken, terminal) — Env2DAirfoil.py:380-428.

        The probe integrals are refreshed by the step that changed the mesh
        (reset: host dots; removal: inside the fused device pass) — a
        window-shift step reuses them unchanged, exactly as re-integrating
        the identical functional on the identical snapshots would.
        Non-finite probe values reproduce the reference's "SAMPLING BROKE"
        terminal (Env2DAirfoil.py:395-397).
        """
        drags = np.asarray(self.new_drags, dtype=np.float64)
        lifts = np.asarray(self.new_lifts, dtype=np.float64)
        if not (np.isfinite(drags).all() and np.isfinite(lifts).all()):
            return NEGATIVE_REWARD, True, True  # "SAMPLING BROKE"
        if info is not None:
            info.drags = drags
            info.lifts = lifts

        rel_err = np.abs(self.gt_drag - drags) / np.abs(self.gt_drag)
        drag_factor = -2.0 * np.log(0.5) / self.threshold
        error_val = np.linalg.norm(rel_err)
        drag_reward = 2.0 * np.exp(-drag_factor * error_val) - 1.0

        removed_count = self.initial_num_nodes - self.mesh.num_vertices
        time_reward = removed_count * self.time_reward

        acc_thresh = bool(np.any(rel_err > self.threshold))
        vert_thresh = (
            self.mesh.num_vertices < self.goal_vertices * self.initial_num_nodes
        )
        if info is not None and (acc_thresh or vert_thresh):
            info.terminal_reason = "accuracy" if acc_thresh else "vertex_floor"

        if np.isnan(drag_reward):
            return NEGATIVE_REWARD, True, True
        return drag_reward + time_reward, False, (acc_thresh or vert_thresh)
