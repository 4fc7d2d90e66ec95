"""--verified deployment: re-sim-rejected removals are rolled back.

Extension beyond the reference (deploy_dqn.py only tracks a best_mesh and
never backtracks, :420-424): with DeployOptions.verified, a removal whose
FULL re-simulation breaches the accuracy threshold is undone (the env is
restored to its pre-removal state), the vertex is masked out of future
greedy selection, and the rollout continues — so every removal recorded in
the complete trajectory is re-simulation-verified.
"""
import copy

import jax
import numpy as np

from meshdqn_tpu.deploy import Deployer, DeployOptions
from meshdqn_tpu.models import init_params

from tests.test_env import ground_truth, small_config  # fixtures  # noqa: F401


def _params(cfg):
    n_feat = 2 + 3 * (cfg.agent.solver_steps // cfg.agent.save_steps)
    return init_params(
        jax.random.PRNGKey(0), n_feat, cfg.agent.N_closest + 1,
        conv_width=16, topk=0.1,
    )


class TestVerifiedDeploy:
    def test_rejected_removal_rolled_back_and_masked(
        self, small_config, ground_truth, tmp_path, monkeypatch
    ):
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "ys930_results_"
        params1 = _params(cfg)
        gt_d = np.asarray(ground_truth.gt_drag)
        gt_l = np.asarray(ground_truth.gt_lift)

        calls = {"n": 0}
        removed_rows = []

        def fake_run_sim(mesh, config, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                # Second re-sim (= second removal attempt) breaches the
                # threshold: +1% drag error vs the 0.1% threshold.
                return gt_d * 1.01, gt_l.copy()
            return gt_d.copy(), gt_l.copy()

        import meshdqn_tpu.deploy.deployer as dep_mod

        monkeypatch.setattr(dep_mod, "run_sim", fake_run_sim)
        opts = DeployOptions(
            complete_traj=True, end_plots=False, verified=True,
            max_rejections=5,
        )
        dep = Deployer(cfg, ground_truth, params1, options=opts, topk=0.1)
        res = dep.run(max_steps=8)

        removals = len(res.removed_coords)
        # One rejection happened: total re-sims = accepted removals
        # + 1 rejected + 1 final on best_mesh.
        assert calls["n"] == removals + 2
        # The trajectory records only verified removals (initial row +
        # one per ACCEPTED removal), and none carries the bad drag.
        assert len(res.traj_vertices) == 1 + removals
        for row in res.complete_drags:
            np.testing.assert_allclose(row, gt_d, rtol=1e-12)
        # est/actions bookkeeping was unwound consistently.
        assert len(res.est_drags) == len(res.est_vertices)
        n_steps_recorded = len(res.actions)
        assert len(res.est_drags) == 1 + n_steps_recorded

    def test_env_snapshot_restore_roundtrip(self, small_config, ground_truth):
        from meshdqn_tpu.env import AirfoilEnv

        env = AirfoilEnv(small_config, ground_truth=ground_truth)
        state0 = env.reset()
        env.calculate_reward()
        snap = env.snapshot_state()
        nv0 = env.mesh.num_vertices
        w0 = np.asarray(env._current_window).copy()
        drags0 = np.asarray(env.new_drags).copy()

        # Remove the first removable window vertex, then restore.
        removed = False
        for a in range(env.action_space_n):
            _, _, _, info = env.step(a)
            if info.removed == 0:
                removed = True
                break
            env.restore_state(snap)
        assert removed, "no removable action in the window"
        assert env.mesh.num_vertices == nv0 - 1

        env.restore_state(snap)
        assert env.mesh.num_vertices == nv0
        assert env.steps == 0
        np.testing.assert_array_equal(
            np.asarray(env._current_window), w0
        )
        np.testing.assert_allclose(np.asarray(env.new_drags), drags0)
        # A fresh state from the restored env matches the pre-removal one.
        s = env.get_state()
        np.testing.assert_allclose(
            np.asarray(s.x), np.asarray(state0.x), rtol=1e-6, atol=1e-7
        )
