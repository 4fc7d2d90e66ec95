"""CLI surface tests: arg parsing + tiny end-to-end invocations."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd=REPO, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # ignored by sitecustomize; --cpu flags used
    return subprocess.run(
        [sys.executable, "-m"] + args,
        capture_output=True,
        text=True,
        cwd=cwd,
        timeout=timeout,
        env=env,
    )


class TestAnalyzeCli:
    def test_reward_and_actions(self, tmp_path):
        from meshdqn_tpu.train import MetricsRecorder

        rec = MetricsRecorder(str(tmp_path), "obj_")
        rng = np.random.default_rng(0)
        for _ in range(6):
            rec.add_episode(list(rng.normal(size=3)), list(rng.integers(0, 181, 3)))
            rec.add_loss(0.5)
            rec.add_eps(0.3)
        rec.write()

        r = run_cli(
            ["meshdqn_tpu.cli.analyze", "reward", "--dir", str(tmp_path), "--prefix", "obj_"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert json.loads(r.stdout.strip().splitlines()[-1])["episodes"] == 6

        r = run_cli(
            ["meshdqn_tpu.cli.analyze", "actions", "--dir", str(tmp_path), "--prefix", "obj_"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["total_actions"] == 18

    def test_benchmark_with_reference_csv(self, tmp_path):
        csv = "/root/reference/training_results/benchmark_results/smooth_ys930_1.0_0.001_smooth_benchmark.csv"
        r = run_cli(
            [
                "meshdqn_tpu.cli.analyze",
                "benchmark",
                "--sweep",
                csv,
                "--deployed",
                str(tmp_path),
                "--obj",
                "ys930_results",
            ]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(tmp_path / "ys930_results_benchmark.png")


class TestTrainCli:
    @pytest.mark.slow
    def test_train_smoke(self, tmp_path, ys930_path):
        # Tiny ground truth (100 steps) + 5 training steps through the CLI.
        cfg_path = tmp_path / "cfg.yaml"
        import yaml

        with open(os.path.join(REPO, "configs", "ys930.yaml")) as f:
            raw = yaml.safe_load(f)
        raw["flow_config"]["geometry_params"]["mesh"] = ys930_path
        raw["agent_params"]["solver_steps"] = 100
        raw["agent_params"]["save_steps"] = 20
        raw["agent_params"]["num_parallel"] = 1
        raw["save_dir"] = str(tmp_path / "out")
        raw["prefix"] = "smoke_"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(raw, f)

        r = run_cli(
            [
                "meshdqn_tpu.cli.train",
                "--config",
                str(cfg_path),
                "--max-steps",
                "5",
                "--cpu",
            ],
            timeout=1800,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        assert summary["global_steps"] == 5
        assert os.path.exists(tmp_path / "out" / "smoke" / "ground_truth.npz")


class TestStatusCli:
    def test_status_summarizes_run(self, tmp_path, capsys):
        import json
        import time

        from meshdqn_tpu.cli.status import main, run_status

        run = tmp_path / "demo_results"
        run.mkdir()
        t0 = time.time() - 10
        with open(run / "train_log.jsonl", "w") as f:
            f.write(json.dumps({"event": "gt", "ts": t0 - 5}) + "\n")
            for i in range(5):
                f.write(json.dumps({
                    "event": "episode", "ts": t0 + 2 * i, "episode": i + 1,
                    "env": 0, "steps": 4, "reward": float(i),
                    "eps": 0.5, "global_step": 4 * (i + 1),
                }) + "\n")
        st = run_status(str(run))
        assert st["episode"] == 5 and st["global_step"] == 20
        assert st["env_steps_per_s"] == 2.0  # 16 steps over 8 s
        assert st["reward_last"] == 4.0
        main(["--runs-dir", str(tmp_path)])
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1 and json.loads(out[0])["run"] == "demo_results"

    def test_status_empty_run_is_silent(self, tmp_path, capsys):
        from meshdqn_tpu.cli.status import main

        (tmp_path / "empty").mkdir()
        main(["--runs-dir", str(tmp_path)])
        assert capsys.readouterr().out.strip() == ""
