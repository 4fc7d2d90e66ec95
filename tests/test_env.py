import os
import pathlib

import numpy as np
import pytest

from meshdqn_tpu.env import AirfoilEnv, GroundTruth, compute_ground_truth
from meshdqn_tpu.env.graph import polyline_distance
from meshdqn_tpu.utils import Config

CACHE = pathlib.Path(__file__).parent / "_cache"


@pytest.fixture(scope="session")
def small_config(ys930_path):
    cfg = Config.from_yaml(str(pathlib.Path(__file__).parent.parent / "configs" / "ys930.yaml"))
    cfg.flow.mesh = ys930_path
    # Short ground-truth solve: 100 steps, 5 snapshots.  Thresholds are
    # relative errors, unaffected by the shorter transient.
    cfg.agent.solver_steps = 100
    cfg.agent.save_steps = 20
    return cfg


@pytest.fixture(scope="session")
def ground_truth(small_config):
    CACHE.mkdir(exist_ok=True)
    path = CACHE / "ys930_gt_100steps.npz"
    if path.exists():
        return GroundTruth.load(str(path))
    gt = compute_ground_truth(small_config)
    gt.save(str(path))
    return gt


@pytest.fixture()
def env(small_config, ground_truth):
    return AirfoilEnv(small_config, ground_truth=ground_truth)


class TestGroundTruth:
    def test_shapes(self, ground_truth):
        gt = ground_truth
        assert gt.snapshots.num_snapshots == 5
        assert gt.gt_drag.shape == (5,)
        assert np.isfinite(gt.gt_drag).all()
        assert gt.mesh.num_vertices == 876

    def test_roundtrip(self, ground_truth, tmp_path):
        p = tmp_path / "gt.npz"
        ground_truth.save(str(p))
        gt2 = GroundTruth.load(str(p))
        assert np.array_equal(gt2.gt_drag, ground_truth.gt_drag)
        assert np.array_equal(gt2.snapshots.u, ground_truth.snapshots.u)


class TestEnvBasics:
    def test_reset_state_shape(self, env):
        s = env.reset()
        assert s.x.shape == (180, 17)
        assert s.edge_index.shape == (2, env.edge_budget)
        assert bool(np.asarray(s.node_mask).all())
        assert np.asarray(s.edge_mask).sum() > 100
        # Features: coords in channel box
        x = np.asarray(s.x)
        assert x[:, 0].min() >= -0.5 and x[:, 0].max() <= 3.0

    def test_window_is_nearest_removable(self, env):
        env.reset()
        win = env._current_window
        assert len(win) == 180
        # All window vertices are removable (interior).
        assert not env.mesh.boundary_vertex_mask[win].any()
        # Window distances are the 180 smallest among removable vertices.
        d_all = polyline_distance(env.mesh.coords[env.removable], env.ring)
        d_win = polyline_distance(env.mesh.coords[win], env.ring)
        assert d_win.max() <= np.sort(d_all)[179] + 1e-12

    def test_step_removes_vertex(self, env):
        env.reset()
        v0 = env.mesh.num_vertices
        state, rew, done, info = env.step(0)
        assert info.removed == 0
        assert env.mesh.num_vertices == v0 - 1
        assert np.isfinite(rew)
        # One good removal: near-perfect drag (interp error tiny) + time bonus
        assert rew > 0.0
        assert not done

    def test_do_nothing_shifts_window(self, env):
        env.reset()
        w0 = env._current_window.copy()
        state, rew, done, info = env.step(env.action_space_n)
        assert env.mesh.num_vertices == env.initial_num_nodes  # nothing removed
        w1 = env._current_window
        assert env.do_nothing_offset == 1
        # Window shifted by one (first element dropped).
        assert not np.array_equal(w0, w1)

    def test_reward_formula(self, env):
        env.reset()
        _, rew, _, info = env.step(3)
        # Recompute from info: K = -2 ln(0.5)/threshold
        K = -2 * np.log(0.5) / env.threshold
        rel = np.abs(env.gt_drag - info.drags) / np.abs(env.gt_drag)
        expected = 2 * np.exp(-K * np.linalg.norm(rel)) - 1 + 1 * env.time_reward
        assert np.isclose(rew, expected, atol=1e-10)

    def test_vertex_floor_termination(self, small_config, ground_truth):
        import copy

        cfg = copy.deepcopy(small_config)
        cfg.agent.goal_vertices = 0.999  # floor after ~1 removal
        env = AirfoilEnv(cfg, ground_truth=ground_truth)
        env.reset()
        _, rew, done, info = env.step(0)
        assert done
        assert info.terminal_reason in ("vertex_floor", "accuracy")

    def test_timestep_cap(self, small_config, ground_truth):
        import copy

        cfg = copy.deepcopy(small_config)
        cfg.agent.timesteps = 2
        env = AirfoilEnv(cfg, ground_truth=ground_truth)
        env.reset()
        _, _, done, _ = env.step(env.action_space_n)
        assert not done
        _, _, done, _ = env.step(env.action_space_n)
        assert done

    def test_episode_rollout_random(self, env):
        rng = np.random.default_rng(0)
        env.reset()
        total = 0.0
        for t in range(15):
            a = int(rng.integers(0, env.action_space_n + 1))
            _, rew, done, info = env.step(a)
            total += rew
            if done:
                break
        assert np.isfinite(total)
        assert env.mesh.cell_volumes().min() > 0  # mesh stayed valid


class TestInterpolationAccuracy:
    def test_drag_error_small_after_removal(self, env):
        # The whole premise of MeshDQN: one removal changes interpolated drag
        # by far less than the 0.1% threshold.
        env.reset()
        _, _, _, info = env.step(0)
        rel = np.abs(env.gt_drag - info.drags) / np.abs(env.gt_drag)
        assert rel.max() < 1e-3


class TestF32Wire:
    def test_f32_wire_matches_f64_batched(self, env):
        """run_products_batched(wire='f32') tracks the f64 wire to ~1e-5
        rel — far below the env's f32 `small` readback granularity and the
        1e-3 thresholds (transfer/interpolate.py f32-wire notes)."""
        env.reset()
        prep = env.prepare_step(0)  # remove nearest window vertex
        assert prep.inputs is not None
        tr = env.transfer
        (d64, *r64) = tr.run_products_batched([prep.inputs], pad_to=4)[0]
        (d32, *r32) = tr.run_products_batched(
            [prep.inputs], pad_to=4, wire="f32"
        )[0]
        f64_, dr64, li64, vw64, pw64 = r64
        f32_, dr32, li32, vw32, pw32 = r32
        assert f64_ == f32_
        # Forces (reward path): p/u functional dots agree to ~1e-5 rel.
        np.testing.assert_allclose(dr32, dr64, rtol=2e-5)
        np.testing.assert_allclose(li32, li64, rtol=2e-4, atol=1e-7)
        # Window features (observation path): f32-rounded eval coordinates
        # shift point values by ~|grad(field)| * 1e-7 — observation noise of
        # ~1e-5 abs, far below physical feature scales O(1).
        np.testing.assert_allclose(vw32, vw64, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(pw32, pw64, rtol=1e-3, atol=1e-5)
        # device-resident interpolants match too (feed later window gathers)
        np.testing.assert_allclose(
            np.asarray(d32[0]), np.asarray(d64[0]), rtol=1e-3, atol=1e-5
        )


@pytest.fixture(scope="session")
def ah93_ground_truth(ah93w145_path):
    cfg = Config.from_yaml(
        str(pathlib.Path(__file__).parent.parent / "configs" / "ah93w145.yaml")
    )
    cfg.flow.mesh = ah93w145_path
    cfg.agent.solver_steps = 100
    cfg.agent.save_steps = 20
    CACHE.mkdir(exist_ok=True)
    path = CACHE / "ah93_gt_100steps.npz"
    if path.exists():
        return cfg, GroundTruth.load(str(path))
    gt = compute_ground_truth(cfg)
    gt.save(str(path))
    return cfg, gt


class TestSecondAirfoil:
    def test_ah93w145_env_end_to_end(self, ah93_ground_truth):
        cfg, gt = ah93_ground_truth
        assert gt.mesh.num_vertices == 797  # SURVEY.md L7
        env = AirfoilEnv(cfg, ground_truth=gt)
        s = env.reset()
        assert s.x.shape == (180, 17)
        _, rew, done, info = env.step(0)
        assert np.isfinite(rew)
        assert env.mesh.num_vertices == 796
        rel = np.abs(env.gt_drag - info.drags) / np.abs(env.gt_drag)
        assert np.isfinite(rel).all()
