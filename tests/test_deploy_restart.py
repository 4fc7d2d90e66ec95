"""Deploy RESTART resume: kill-and-resume an interrupted complete_traj run.

The reference's RESTART flag (deploy_dqn.py:68, 113-124) re-prefixes deploy
artifacts per restart; here the per-step deployment state is additionally
persisted so a killed complete_traj deployment (each removal = a full
5000-step re-simulation) resumes without recomputing completed re-sims.
"""
import copy
import os

import jax
import numpy as np
import pytest

from meshdqn_tpu.deploy import Deployer, DeployOptions
from meshdqn_tpu.models import init_params

from tests.test_env import ground_truth, small_config  # fixtures  # noqa: F401


def _params(cfg):
    n_feat = 2 + 3 * (cfg.agent.solver_steps // cfg.agent.save_steps)
    return init_params(
        jax.random.PRNGKey(0), n_feat, cfg.agent.N_closest + 1,
        conv_width=16, topk=0.1,
    )


class TestDeployRestart:
    def test_kill_and_resume_mid_complete_traj(
        self, small_config, ground_truth, tmp_path, monkeypatch
    ):
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "ys930_results_"
        params1 = _params(cfg)
        gt_d = np.asarray(ground_truth.gt_drag)
        gt_l = np.asarray(ground_truth.gt_lift)

        calls = {"n": 0}

        def fake_run_sim(mesh, config, _kill_at=None, **kw):
            calls["n"] += 1
            if _kill_at is not None and calls["n"] == _kill_at:
                raise KeyboardInterrupt("simulated kill mid-re-simulation")
            return gt_d.copy(), gt_l.copy()

        import meshdqn_tpu.deploy.deployer as dep_mod

        # --- run 1: killed during the SECOND removal's re-simulation ------
        monkeypatch.setattr(
            dep_mod, "run_sim", lambda m, c, **kw: fake_run_sim(m, c, _kill_at=2)
        )
        opts = DeployOptions(complete_traj=True, end_plots=False)
        dep = Deployer(cfg, ground_truth, params1, options=opts, topk=0.1)
        with pytest.raises(KeyboardInterrupt):
            dep.run(max_steps=6)
        assert os.path.exists(dep.resume_path)
        with np.load(dep.resume_path) as z:
            n_completed = len(z["raw_actions"])
            traj_rows_before = len(z["traj_drags"])
        assert n_completed >= 1
        assert not bool(np.load(dep.resume_path)["done"])
        calls_run1 = calls["n"]  # completed sims + the one that died

        # --- run 2: --restart resumes without redoing completed re-sims ---
        calls["n"] = 0
        monkeypatch.setattr(dep_mod, "run_sim", fake_run_sim)
        opts2 = DeployOptions(complete_traj=True, end_plots=False, restart=True)
        dep2 = Deployer(cfg, ground_truth, params1, options=opts2, topk=0.1)
        res = dep2.run(max_steps=6)

        removals = len(res.removed_coords)
        # Total re-sims across both runs = one per removal + the killed one
        # + the final timed re-sim: nothing completed was recomputed.
        completed_sims_run1 = calls_run1 - 1
        assert calls["n"] == (removals - completed_sims_run1) + 1
        # Artifacts carry the reference-style restart_ prefix and the FULL
        # history (initial row + one per removal).
        out = tmp_path / "ys930_results" / "deployed"
        traj = np.load(out / "restart_ys930_results_drag_trajectory.npy")
        assert traj.shape[0] == 1 + removals
        assert traj.shape[0] >= traj_rows_before  # history carried over
        est = np.load(out / "restart_ys930_results_interpolate_drag_trajectory.npy")
        assert est.shape[0] == 1 + len(res.actions)
        # Completed deployment removes its resume state.
        assert not os.path.exists(dep2.resume_path)

    def test_restart_without_resume_state_runs_fresh(
        self, small_config, ground_truth, tmp_path, monkeypatch
    ):
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "ys930_results_"
        params1 = _params(cfg)
        opts = DeployOptions(complete_traj=False, end_plots=False, restart=True)
        dep = Deployer(cfg, ground_truth, params1, options=opts, topk=0.1)
        res = dep.run(max_steps=2)
        # No resume state existed: plain-prefixed artifacts, fresh run.
        out = tmp_path / "ys930_results" / "deployed"
        assert (out / "ys930_results_interpolate_drag_trajectory.npy").exists()
        assert len(res.actions) >= 1
