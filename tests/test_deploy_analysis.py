import os
import pathlib

import numpy as np
import pytest
import jax

from meshdqn_tpu.analysis import (
    analyze_actions,
    benchmark_figure,
    plot_reward,
    sweep_overlay_figure,
)
from meshdqn_tpu.deploy import Deployer, DeployOptions, plot_mesh, plot_state, vertex_plot
from meshdqn_tpu.env import AirfoilEnv, GroundTruth
from meshdqn_tpu.models import init_params
from meshdqn_tpu.train import MetricsRecorder
from meshdqn_tpu.utils import Config

from tests.test_env import ground_truth, small_config  # fixtures


@pytest.fixture()
def trained_dir(tmp_path):
    """A fake completed training run's artifacts."""
    rec = MetricsRecorder(str(tmp_path), "ys930_results_")
    rng = np.random.default_rng(0)
    for ep in range(12):
        n = int(rng.integers(2, 8))
        rews = list(rng.normal(size=n))
        acts = list(rng.integers(0, 181, size=n))
        rec.add_episode(rews, acts)
        for _ in range(n):
            rec.add_eps(0.5)
            rec.add_loss(float(rng.random()))
    rec.write()
    return tmp_path


class TestAnalysis:
    def test_plot_reward(self, trained_dir):
        stats = plot_reward(str(trained_dir), "ys930_results_")
        assert stats["episodes"] == 12
        assert os.path.exists(trained_dir / "ys930_results_reward_analysis.png")

    def test_analyze_actions(self, trained_dir):
        stats = analyze_actions(str(trained_dir), "ys930_results_")
        assert stats["grad_steps"] > 0
        assert 0 <= stats["do_nothing_share"] <= 1
        assert stats["best_episode_reward"] >= stats["worst_episode_reward"]
        assert os.path.exists(trained_dir / "ys930_results_actions_analysis.png")

    def test_benchmark_figure_from_reference_csv(self, tmp_path):
        # Consume the reference's own shipped sweep CSV unchanged.
        csv = "/root/reference/training_results/benchmark_results/smooth_ys930_1.0_0.001_smooth_benchmark.csv"
        stats = benchmark_figure(csv, str(tmp_path), "ys930_results")
        assert os.path.exists(tmp_path / "ys930_results_benchmark.png")
        assert stats == {}  # no deployed trajectories present

    def test_sweep_overlay_figure(self, tmp_path):
        # Our generated-from-geometry sweep vs the reference's shipped CSV:
        # the overlay is the VERDICT-5 acceptance artifact (matching drag
        # trend over the shared vertex range).
        ref = "/root/reference/training_results/benchmark_results/smooth_ys930_1.0_0.001_smooth_benchmark.csv"
        gen = "docs/examples/gen_ys930_benchmark_r2.csv"
        out = tmp_path / "overlay.png"
        stats = sweep_overlay_figure(gen, ref, "drag", out=str(out))
        assert out.exists()
        assert stats["n_gen"] >= 8 and stats["n_ref"] > 40
        # generated rows track the reference trend; the sweep scatter itself
        # is a few percent at coarse resolutions, so gate loosely
        assert stats["median_rel_dev"] < 0.08


class TestViz:
    def test_mesh_plots(self, ground_truth, tmp_path):
        m = ground_truth.mesh
        vertex_plot(m, str(tmp_path / "vp"), title="YS930", vertex_coord=m.coords[300])
        plot_mesh(m, str(tmp_path / "pm"), title="mesh", vertex_coords=m.coords[:3])
        assert os.path.exists(tmp_path / "vp.png")
        assert os.path.exists(tmp_path / "pm.png")

    def test_plot_state(self, small_config, ground_truth, tmp_path):
        env = AirfoilEnv(small_config, ground_truth=ground_truth)
        plot_state(env, filename="initial_state", plot_dir=str(tmp_path))
        assert os.path.exists(tmp_path / "initial_state.png")


class TestDeploy:
    def test_greedy_rollout_no_resim(self, small_config, ground_truth, tmp_path):
        import copy

        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "ys930_results_"
        n_feat = 2 + 3 * (cfg.agent.solver_steps // cfg.agent.save_steps)
        params1 = init_params(
            jax.random.PRNGKey(0), n_feat, cfg.agent.N_closest + 1,
            conv_width=32, topk=0.1,
        )
        opts = DeployOptions(complete_traj=False, end_plots=True, plot_traj=False)
        dep = Deployer(cfg, ground_truth, params1, options=opts, topk=0.1)
        res = dep.run(max_steps=3)

        assert res.initial_vertices == 876
        assert res.final_vertices <= 876
        out = tmp_path / "ys930_results" / "deployed"
        est = np.load(out / "ys930_results_interpolate_drag_trajectory.npy")
        # columns: verts + S drags + S lifts
        S = ground_truth.snapshots.num_snapshots
        assert est.shape[1] == 1 + 2 * S
        assert est[0, 0] == 876
        assert np.isfinite(res.final_drag)
        assert np.isfinite(res.drag_error_pct)
        # complete_* artifacts exist even without complete_traj
        assert os.path.exists(out / "ys930_results_complete_drags.npy")

    def test_use_best_replays_training_episode(
        self, small_config, ground_truth, tmp_path
    ):
        import copy

        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "ys930_results_"
        run_dir = tmp_path / "ys930_results"
        run_dir.mkdir()
        rec = MetricsRecorder(str(run_dir), cfg.prefix)
        rec.add_episode([0.1, 0.2], [5, 181])  # weak episode
        rec.add_episode([1.0, 1.0], [3, 7])  # best episode
        rec.write()

        n_feat = 2 + 3 * (cfg.agent.solver_steps // cfg.agent.save_steps)
        params1 = init_params(
            jax.random.PRNGKey(0), n_feat, cfg.agent.N_closest + 1,
            conv_width=16, topk=0.1,
        )
        opts = DeployOptions(complete_traj=False, end_plots=False, use_best=True)
        dep = Deployer(cfg, ground_truth, params1, options=opts, topk=0.1)
        res = dep.run(max_steps=5)
        # Replayed exactly the best episode's actions (2 steps).
        assert res.actions[:2] == [3, 7]
        assert len(res.actions) <= 2 + 1


@pytest.mark.slow
class TestDeployCompleteTraj:
    def test_complete_traj_resimulation(self, small_config, ground_truth, tmp_path):
        import copy

        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "ys930_results_"
        n_feat = 2 + 3 * (cfg.agent.solver_steps // cfg.agent.save_steps)
        params1 = init_params(
            jax.random.PRNGKey(0), n_feat, cfg.agent.N_closest + 1,
            conv_width=16, topk=0.1,
        )
        opts = DeployOptions(complete_traj=True, end_plots=False)
        dep = Deployer(cfg, ground_truth, params1, options=opts, topk=0.1)
        res = dep.run(max_steps=2)
        out = tmp_path / "ys930_results" / "deployed"
        # Re-simulated trajectory artifact: initial row + one per removal.
        traj = np.load(out / "ys930_results_drag_trajectory.npy")
        S = ground_truth.snapshots.num_snapshots
        assert traj.shape[1] == 1 + 2 * S
        assert traj.shape[0] == 1 + len(res.removed_coords)
        # Re-simulated drags on the coarsened mesh stay close to ground truth
        # (the whole point of the method).
        rel = np.abs(traj[-1, 1 + S - 1] - traj[0, 1 + S - 1]) / abs(traj[0, 1 + S - 1])
        assert rel < 0.05


class TestSurrogate:
    @pytest.mark.slow
    def test_train_save_load_deploy_surrogate(
        self, small_config, ground_truth, tmp_path
    ):
        """End-to-end SURROGATE_MODEL path (deploy_dqn.py:19, 95-100, 193,
        309 intended semantics): train a tiny AirfoilGCNN on rollout pairs,
        save, deploy with surrogate=True, check the surrogate trajectory
        artifact."""
        import copy

        from meshdqn_tpu.models.surrogate_train import (
            load_surrogate,
            save_surrogate,
            train_surrogate,
        )

        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "ys930_results_"

        # Collect a few (state, drag) pairs from a random rollout.
        env = AirfoilEnv(cfg, ground_truth=ground_truth)
        rng = np.random.default_rng(0)
        states, labels = [], []
        state = env.reset()
        for _ in range(8):
            states.append(state)
            labels.append(float(np.asarray(env.new_drags)[-1]))
            state, _, done, _ = env.step(int(rng.integers(0, 180)))
            if done:
                state = env.reset()
        graphs = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *states)
        params, report = train_surrogate(
            graphs, np.asarray(labels), conv_width=8, epochs=3, batch_size=4
        )
        assert np.isfinite(report["train_mse"])

        run_dir = tmp_path / "ys930_results"
        run_dir.mkdir(exist_ok=True)
        spath = run_dir / "ys930_results_surrogate_model.npz"
        save_surrogate(str(spath), params, conv_width=8, topk=0.5)
        p2, topk = load_surrogate(str(spath))
        assert topk == 0.5

        n_feat = 2 + 3 * (cfg.agent.solver_steps // cfg.agent.save_steps)
        params1 = init_params(
            jax.random.PRNGKey(0), n_feat, cfg.agent.N_closest + 1,
            conv_width=32, topk=0.1,
        )
        opts = DeployOptions(
            complete_traj=False, end_plots=False, surrogate_model=True
        )
        dep = Deployer(cfg, ground_truth, params1, options=opts, topk=0.1)
        res = dep.run(max_steps=3)
        out = run_dir / "deployed"
        traj = np.load(out / "ys930_results_surrogate_drag_trajectory.npy")
        assert traj.shape[1] == 2
        assert np.isfinite(traj).all()
        assert len(res.surrogate_drags) == len(traj) + 0 or len(
            res.surrogate_drags
        ) >= len(traj)
        assert os.path.exists(out / "ys930_results_surrogate_model.npz")
