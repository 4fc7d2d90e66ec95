"""Fault-injection tests for the failure/rollback paths.

The reference handles domain failures with try/except + mesh rollback +
negative reward (SURVEY.md §5: Env2DAirfoil.py:487-491, 547-602, 372-397).
These tests force each failure mode and assert the env/coarsener respond
with the reference's semantics: status 2 / reward -1 / terminal / state
unchanged.
"""
import numpy as np
import pytest

from meshdqn_tpu.coarsen import RemovalStatus, remove_vertex
from meshdqn_tpu.env import AirfoilEnv
from meshdqn_tpu.mesh import TriMesh

from tests.test_env import env, ground_truth, small_config  # fixtures


class TestCoarsenFaults:
    def test_collinear_points_cannot_triangulate(self):
        # All points on a line after removal -> triangulation must fail
        # cleanly with BROKE_MESH (Env2DAirfoil.py:487-491 semantics).
        coords = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [1.0, 1.0]])
        cells = np.array([[0, 1, 3], [1, 2, 3]], dtype=np.int32)
        mesh = TriMesh(coords=coords, cells=cells)
        res = remove_vertex(mesh, 3, removable_mask=np.array([0, 0, 0, 1], bool))
        assert res.status == RemovalStatus.BROKE_MESH
        assert res.mesh is None

    def test_out_of_range_vertex(self):
        coords = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        mesh = TriMesh(coords=coords, cells=np.array([[0, 1, 2]], dtype=np.int32))
        assert remove_vertex(mesh, 99).status == RemovalStatus.BROKE_MESH
        assert remove_vertex(mesh, -1).status == RemovalStatus.BROKE_MESH


class TestEnvFaults:
    def test_broken_removal_rolls_back(self, env, monkeypatch):
        env.reset()
        coords_before = env.mesh.coords.copy()

        from meshdqn_tpu.env import airfoil_env
        from meshdqn_tpu.coarsen import RemovalResult

        monkeypatch.setattr(
            airfoil_env,
            "remove_vertex",
            lambda *a, **k: RemovalResult(RemovalStatus.BROKE_MESH, None, None),
        )
        state, rew, done, info = env.step(0)
        assert rew == -1.0
        assert done
        assert info.broken
        # Mesh unchanged (rollback).
        assert np.array_equal(env.mesh.coords, coords_before)

    def test_nan_interpolation_rejected(self, env, monkeypatch):
        # Non-finite interpolants out of the fused device pass -> rollback
        # (the reference's "INTERPOLATION BROKE", Env2DAirfoil.py:569-573).
        env.reset()
        coords_before = env.mesh.coords.copy()

        def nan_products(inputs):
            return None, False, None, None, None, None

        monkeypatch.setattr(
            env.transfer, "step_products_from_inputs", nan_products
        )
        state, rew, done, info = env.step(0)
        assert rew == -1.0
        assert done and info.broken
        assert np.array_equal(env.mesh.coords, coords_before)

    def test_interpolation_exception_rolls_back(self, env, monkeypatch):
        env.reset()
        coords_before = env.mesh.coords.copy()

        def boom(*a, **k):
            raise RuntimeError("interp broke")

        monkeypatch.setattr(env.transfer, "step_products_from_inputs", boom)
        state, rew, done, info = env.step(0)
        assert rew == -1.0
        assert done and info.broken
        assert np.array_equal(env.mesh.coords, coords_before)

    def test_nan_reward_trapped(self, env, monkeypatch):
        # NaN probe integrals out of an otherwise-successful removal ->
        # reward clamped to -1, "SAMPLING BROKE" terminal
        # (Env2DAirfoil.py:372-375, 395-397).
        env.reset()
        real = env.transfer.step_products_from_inputs

        def nan_drags(*a, **k):
            dev, finite, drags, lifts, vel_w, p_w = real(*a, **k)
            return dev, finite, np.full_like(drags, np.nan), lifts, vel_w, p_w

        monkeypatch.setattr(env.transfer, "step_products_from_inputs", nan_drags)
        state, rew, done, info = env.step(0)
        assert rew == -1.0
        assert done and info.broken

    def test_sampling_exception_terminal(self, env):
        # "SAMPLING BROKE" path (Env2DAirfoil.py:395-397): non-finite cached
        # probe values -> reward -1, broken, terminal.
        env.reset()
        env.new_drags = np.full_like(np.asarray(env.new_drags), np.nan)
        rew, broken, terminal = env.calculate_reward()
        assert rew == -1.0 and broken and terminal
