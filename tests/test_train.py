import copy
import json
import os

import numpy as np
import jax
import pytest

from meshdqn_tpu.models import init_params
from meshdqn_tpu.rl import DQNConfig, init_dqn, train_step, ReplayBuffer
from meshdqn_tpu.train import CheckpointManager, MetricsRecorder, Trainer
from meshdqn_tpu.utils import Config

from tests.test_env import ground_truth, small_config  # fixtures
from tests.test_models_rl import make_graph


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = DQNConfig(lr=1e-3, target_update=5, topk=0.1)
        p1 = init_params(jax.random.PRNGKey(0), 17, 8, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 8, conv_width=8, topk=0.1)
        state = init_dqn(p1, p2, cfg)

        # Take some gradient steps so optimizer state is non-trivial.
        buf = ReplayBuffer(32, 10, 17, 16)
        for i in range(8):
            g = make_graph(10, 10, [(0, 1)], seed=i, e_pad=16)
            buf.push(g, i % 8, g, 0.1 * i)
        rng = np.random.default_rng(0)
        for _ in range(3):
            state, _ = train_step(state, buf.sample(4, rng), cfg)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(3, state, {"global_step": 42, "episode": 3})

        template = init_dqn(p1, p2, cfg)
        restored, extras, step = mgr.restore(template)
        assert step == 3
        assert extras["global_step"] == 42
        assert int(restored.num_grads) == int(state.num_grads)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params1),
            jax.tree_util.tree_leaves(restored.params1),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        # Optimizer moments restored exactly too.
        for a, b in zip(
            jax.tree_util.tree_leaves(state.opt1),
            jax.tree_util.tree_leaves(restored.opt1),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_restore_none_when_empty(self, tmp_path):
        cfg = DQNConfig()
        p1 = init_params(jax.random.PRNGKey(0), 17, 8, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 8, conv_width=8, topk=0.1)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.restore(init_dqn(p1, p2, cfg)) is None


class TestTrainerResume:
    def test_trainer_runs_and_resumes(self, small_config, ground_truth, tmp_path):
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "ys930_results_"
        cfg.agent.num_parallel = 1
        cfg.optimizer.batch_size = 4

        tr = Trainer(cfg, ground_truth=ground_truth, resume=True)
        s1 = tr.train(max_steps=6)
        assert s1["global_steps"] == 6

        # Resume in a fresh Trainer: must pick up counters from the latest
        # checkpoint (written at each episode end).
        tr2 = Trainer(cfg, ground_truth=ground_truth, resume=True)
        if tr2.state.episode > 0:  # at least one episode finished
            assert tr2.state.global_step > 0
            assert len(tr2.metrics.rewards) == tr2.state.episode
        s2 = tr2.train(max_steps=tr2.state.global_step + 4)
        assert s2["global_steps"] >= s1["global_steps"]

    def test_stop_file_lossless_shutdown(
        self, small_config, ground_truth, tmp_path, monkeypatch
    ):
        """A STOP file in the run dir ends the run via _maybe_recycle with
        exit code 0 after saving EVERYTHING (checkpoint + metrics + replay
        ring), and a fresh Trainer resumes bit-losslessly."""
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "stop_"
        cfg.agent.num_parallel = 1
        cfg.optimizer.batch_size = 4

        tr = Trainer(cfg, ground_truth=ground_truth, resume=False)
        tr.train(max_steps=5)  # accumulate replay + optimizer state

        open(os.path.join(tr.save_dir, "STOP"), "w").close()

        class _Exit(Exception):
            pass

        monkeypatch.setattr(os, "_exit", lambda code: (_ for _ in ()).throw(_Exit(code)))
        with pytest.raises(_Exit) as ei:
            tr.train(num_episodes=10**6, max_steps=10**9)
        assert ei.value.args[0] == 0, "STOP exit must be rc=0 (loop terminates)"
        assert not os.path.exists(os.path.join(tr.save_dir, "STOP"))
        events = [
            json.loads(line)["event"]
            for line in open(os.path.join(tr.save_dir, "train_log.jsonl"))
        ]
        assert "stop" in events

        tr2 = Trainer(cfg, ground_truth=ground_truth, resume=True)
        assert tr2.state.global_step == tr.state.global_step
        assert tr2.state.episode == tr.state.episode
        assert len(tr2.replay) == len(tr.replay)
        for a, b in zip(
            jax.tree_util.tree_leaves(tr.dqn.params1),
            jax.tree_util.tree_leaves(tr2.dqn.params1),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_pause_file_lossless_pause(
        self, small_config, ground_truth, tmp_path, monkeypatch
    ):
        """A PAUSE file makes the trainer save everything, ack PAUSE->PAUSED
        and exit 76 (run_train_loop.sh holds the relaunch on that code until
        the ack disappears); a fresh Trainer resumes losslessly."""
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "pause_"
        cfg.agent.num_parallel = 1
        cfg.optimizer.batch_size = 4

        tr = Trainer(cfg, ground_truth=ground_truth, resume=False)
        tr.train(max_steps=5)

        open(os.path.join(tr.save_dir, "PAUSE"), "w").close()

        class _Exit(Exception):
            pass

        monkeypatch.setattr(os, "_exit", lambda code: (_ for _ in ()).throw(_Exit(code)))
        with pytest.raises(_Exit) as ei:
            tr.train(num_episodes=10**6, max_steps=10**9)
        assert ei.value.args[0] == 76, "PAUSE exit must be rc=76 (loop waits)"
        assert not os.path.exists(os.path.join(tr.save_dir, "PAUSE"))
        assert os.path.exists(os.path.join(tr.save_dir, "PAUSED"))
        events = [
            json.loads(line)["event"]
            for line in open(os.path.join(tr.save_dir, "train_log.jsonl"))
        ]
        assert "pause" in events

        tr2 = Trainer(cfg, ground_truth=ground_truth, resume=True)
        assert tr2.state.global_step == tr.state.global_step
        assert len(tr2.replay) == len(tr.replay)

    def test_infra_failure_aborts_sweep_without_poisoning_replay(
        self, small_config, ground_truth, tmp_path, monkeypatch
    ):
        """A device/link exception in the BATCHED removal pass must abort
        the affected steps (no transitions, no counters) instead of pushing
        false broken-mesh terminals — and a persistent outage must crash
        the process after a bounded streak for the outer loop to restart."""
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "infra_"
        cfg.agent.num_parallel = 2
        cfg.optimizer.batch_size = 4

        tr = Trainer(cfg, ground_truth=ground_truth, resume=False)

        def boom(*a, **k):
            raise RuntimeError("link down")

        monkeypatch.setattr(
            type(tr._shared_transfer), "run_products_batched_begin", boom
        )
        with pytest.raises(RuntimeError, match="sweeps in a row"):
            tr.train(num_episodes=10**6, max_steps=10**9)

        events = [
            json.loads(line)["event"]
            for line in open(os.path.join(tr.save_dir, "train_log.jsonl"))
        ]
        assert events.count("infra_abort") >= 5
        # Completed (non-aborted) steps push exactly one transition each;
        # aborted steps push nothing and advance no counters.
        assert len(tr.replay) == tr.state.global_step

    def test_metrics_artifacts_reference_compatible(
        self, small_config, ground_truth, tmp_path
    ):
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "ys930_results_"
        cfg.agent.num_parallel = 1
        cfg.agent.timesteps = 2  # force quick episode ends
        tr = Trainer(cfg, ground_truth=ground_truth, resume=False)
        tr.train(num_episodes=2)
        d = os.path.join(str(tmp_path), "ys930_results")
        for name in ("reward", "rewards", "losses", "actions", "eps"):
            path = os.path.join(d, f"ys930_results_{name}.npy")
            assert os.path.exists(path), name
            np.load(path, allow_pickle=True)
        # Analysis consumes them.
        from meshdqn_tpu.analysis import analyze_actions, plot_reward

        assert plot_reward(d, "ys930_results_")["episodes"] == 2
        analyze_actions(d, "ys930_results_")

    def test_resume_truncates_metrics_ahead_of_checkpoint(
        self, small_config, ground_truth, tmp_path
    ):
        """Metric arrays written AFTER the checkpoint (autopack between a
        write and a save) must be truncated back to the checkpoint counters
        on resume so re-run episodes are not recorded twice (ADVICE r3)."""
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "trunc_"
        cfg.agent.num_parallel = 1
        cfg.agent.timesteps = 2
        tr = Trainer(cfg, ground_truth=ground_truth, resume=False)
        tr.train(num_episodes=2)
        ep, gs = tr.state.episode, tr.state.global_step
        # Simulate runaway arrays: append phantom entries and rewrite.
        tr.metrics.rewards += [99.0, 98.0]
        tr.metrics.ep_rewards += [[99.0], [98.0]]
        tr.metrics.actions += [[0], [1]]
        tr.metrics.epss += [0.5] * 5
        tr.metrics.losses += [123.0] * 7
        tr.metrics.write()

        tr2 = Trainer(cfg, ground_truth=ground_truth, resume=True)
        assert tr2.state.episode == ep
        assert len(tr2.metrics.rewards) == ep
        assert len(tr2.metrics.ep_rewards) == ep
        assert len(tr2.metrics.actions) == ep
        assert len(tr2.metrics.epss) == gs
        assert 99.0 not in tr2.metrics.rewards
        assert 123.0 not in tr2.metrics.losses

    def test_replay_capacity_from_config(
        self, small_config, ground_truth, tmp_path
    ):
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "cap_"
        cfg.agent.num_parallel = 1
        cfg.agent.replay_capacity = 123
        tr = Trainer(cfg, ground_truth=ground_truth, resume=False)
        assert tr.replay.capacity == 123

    def test_best_checkpoint_tracks_ma_high_water(
        self, small_config, ground_truth, tmp_path
    ):
        """ckpt_best/ must hold the policy from the best reward-MA window,
        surviving later degradation (round 3 retained only the collapsed
        final checkpoint of a run that peaked mid-flight)."""
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "best_"
        cfg.agent.num_parallel = 1
        cfg.agent.timesteps = 2
        cfg.agent.checkpoint_every = 1
        tr = Trainer(cfg, ground_truth=ground_truth, resume=False)
        tr.best_window = 2  # test-scale MA window
        tr.train(num_episodes=3)
        best_dir = os.path.join(tr.save_dir, "ckpt_best")
        steps = [n for n in os.listdir(best_dir) if n.startswith("step_")]
        assert steps, "a best checkpoint must exist once the window fills"
        ext = json.load(
            open(os.path.join(best_dir, steps[0], "extras.json"))
        )
        assert "best_ma1000" in ext
        # Degrade: fake a much worse tail and checkpoint again — ckpt_best
        # must NOT move.
        before = sorted(os.listdir(best_dir))
        tr.metrics.rewards += [-100.0, -100.0]
        tr.state.episode += 1
        tr._save_checkpoint()
        assert sorted(os.listdir(best_dir)) == before
        # Resume keeps the high-water mark.
        tr2 = Trainer(cfg, ground_truth=ground_truth, resume=True)
        assert tr2._best_ma == pytest.approx(tr._best_ma)


    def test_deploy_probe_tracks_removal_high_water(
        self, small_config, ground_truth, tmp_path
    ):
        """probe_every rolls a greedy eps=0 episode and snapshots
        ckpt_best_deploy/ on a removals-within-threshold high — model
        selection by the deploy deliverable, not training reward (round 4:
        the reward high-water ys930 policy was a do-nothing farm making 4
        greedy removals while a mid-reward checkpoint made 28)."""
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "probe_"
        cfg.agent.num_parallel = 1
        cfg.agent.timesteps = 2
        cfg.agent.probe_every = 1
        tr = Trainer(cfg, ground_truth=ground_truth, resume=False)
        tr.train(num_episodes=2)
        deploy_dir = os.path.join(tr.save_dir, "ckpt_best_deploy")
        steps = [
            n
            for n in (os.listdir(deploy_dir) if os.path.isdir(deploy_dir) else [])
            if n.startswith("step_")
        ]
        assert steps, "a deploy-probe checkpoint must exist"
        ext = json.load(
            open(os.path.join(deploy_dir, steps[0], "extras.json"))
        )
        assert "best_deploy_removals" in ext
        assert ext["best_deploy_removals"] == tr._best_deploy[0]
        # Probe events are logged for curve visibility.
        events = [
            json.loads(l)
            for l in open(os.path.join(tr.save_dir, "train_log.jsonl"))
        ]
        probes = [e for e in events if e.get("event") == "deploy_probe"]
        assert probes and "removals_ok" in probes[0]
        # A worse probe must NOT displace the snapshot; resume restores
        # the high-water tuple.
        before = sorted(os.listdir(deploy_dir))
        tr._best_deploy = (10**6, 0.0)  # pretend an unbeatable high water
        tr._deploy_probe(max_steps=1)
        assert sorted(os.listdir(deploy_dir)) == before
        tr.state.episode += 1
        tr._save_checkpoint()
        tr2 = Trainer(cfg, ground_truth=ground_truth, resume=True)
        assert tr2._best_deploy[0] == 10**6


class TestTrainerDataParallel:
    def test_dp_trainer_runs_on_8_devices(self, small_config, ground_truth, tmp_path):
        # batch 8 shards 1-per-device over the virtual mesh.
        cfg = copy.deepcopy(small_config)
        cfg.save_dir = str(tmp_path)
        cfg.prefix = "dp_"
        cfg.agent.num_parallel = 1
        cfg.optimizer.batch_size = 8
        tr = Trainer(cfg, ground_truth=ground_truth, resume=False, data_parallel=True)
        assert tr.data_parallel
        s = tr.train(max_steps=10)
        assert s["global_steps"] == 10
        assert s["grad_steps"] >= 2  # batch filled after 8 pushes
        assert np.isfinite(s["mean_reward"]) or s["episodes"] == 0

    def test_dp_trainer_bit_parity_with_single_device(
        self, small_config, ground_truth, tmp_path
    ):
        """Multi-episode training on the 8-device mesh must reproduce the
        single-device run: the same host RNG drives the same actions and the
        same episode boundaries (asserted BITWISE via the reward
        trajectories), and the learned parameters agree to reduction-order
        tolerance — pmean of per-shard gradient means re-associates the sum,
        so exact bit equality is not a meaningful contract (VERDICT r1
        item 10)."""
        import jax

        def run(dp: bool, prefix: str):
            cfg = copy.deepcopy(small_config)
            cfg.save_dir = str(tmp_path)
            cfg.prefix = prefix
            cfg.agent.num_parallel = 8  # divisible by the device count
            cfg.optimizer.batch_size = 8
            tr = Trainer(
                cfg, ground_truth=ground_truth, resume=False, data_parallel=dp
            )
            summary = tr.train(max_steps=40)
            return tr, summary

        tr1, s1 = run(False, "par_single_")
        tr8, s8 = run(True, "par_dp_")
        assert s1["episodes"] == s8["episodes"] >= 2, "want multi-episode"
        assert s1["global_steps"] == s8["global_steps"] == 40
        assert s1["grad_steps"] == s8["grad_steps"]
        # identical reward trajectories (same actions taken throughout)
        np.testing.assert_array_equal(
            np.asarray(tr1.metrics.rewards), np.asarray(tr8.metrics.rewards)
        )
        # learned parameters agree to reduction-order tolerance
        for a, b in zip(
            jax.tree_util.tree_leaves(tr1.dqn.params1)
            + jax.tree_util.tree_leaves(tr1.dqn.params2),
            jax.tree_util.tree_leaves(tr8.dqn.params1)
            + jax.tree_util.tree_leaves(tr8.dqn.params2),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )


class TestGtCachePrecisionReuse:
    def test_deploy_reuses_training_gt_across_precision(
        self, small_config, ground_truth, tmp_path
    ):
        """Deploy must reuse the training-precision GT (the policy's
        reference frame) instead of clobbering the cache when only the
        re-simulation precision differs."""
        import copy as _copy
        import json

        from meshdqn_tpu.train.gtcache import load_or_compute_ground_truth

        cfg = _copy.deepcopy(small_config)
        d = str(tmp_path)
        got = load_or_compute_ground_truth(cfg, d, ground_truth)
        meta_path = tmp_path / "ground_truth_meta.json"
        before = json.loads(meta_path.read_text())

        cfg2 = _copy.deepcopy(cfg)
        cfg2.flow.precision = "f32"
        reused = load_or_compute_ground_truth(cfg2, d, reuse_any_precision=True)
        # same snapshots, sidecar untouched
        np.testing.assert_array_equal(reused.gt_drag, got.gt_drag)
        assert json.loads(meta_path.read_text()) == before

    def test_mesh_change_still_recomputes(
        self, small_config, ground_truth, tmp_path, ah93w145_path
    ):
        import copy as _copy

        from meshdqn_tpu.train.gtcache import gt_fingerprint

        cfg = _copy.deepcopy(small_config)
        fp1 = gt_fingerprint(cfg)
        cfg.flow.mesh = ah93w145_path
        cfg.flow.precision = "f32"
        fp2 = gt_fingerprint(cfg)
        strip = lambda m: {
            k: v for k, v in m.items() if k not in ("precision", "refine_iters")
        }
        assert strip(fp1) != strip(fp2)  # reuse_any_precision would NOT fire
