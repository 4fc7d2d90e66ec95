"""Round-trip test for scripts/snapshot_checkpoint.py (cross-clone resume
packs).  The pack must carry exactly the state `Trainer(resume=True)` reads:
the latest orbax step, the metrics arrays, and the ground-truth cache."""

import importlib.util
import json
import os

import jax
import numpy as np

from meshdqn_tpu.models import init_params
from meshdqn_tpu.rl import DQNConfig, init_dqn
from meshdqn_tpu.train import CheckpointManager

_SPEC = importlib.util.spec_from_file_location(
    "snapshot_checkpoint",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "snapshot_checkpoint.py"),
)
snap = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(snap)


def _fake_run(run_dir, prefix="fake_results_", steps=(3, 7)):
    cfg = DQNConfig(topk=0.5)
    p1 = init_params(jax.random.PRNGKey(0), 17, 8, conv_width=8, topk=0.5)
    p2 = init_params(jax.random.PRNGKey(1), 17, 8, conv_width=8, topk=0.5)
    state = init_dqn(p1, p2, cfg)
    mgr = CheckpointManager(os.path.join(run_dir, "ckpt"))
    for s in steps:
        mgr.save(s, state, {"global_step": s, "episode": s // 2})
    for suffix in ("reward", "rewards", "losses", "actions", "eps"):
        np.save(os.path.join(run_dir, f"{prefix}{suffix}.npy"),
                np.arange(4, dtype=np.float64))
    np.savez(os.path.join(run_dir, "ground_truth.npz"), x=np.ones(3))
    with open(os.path.join(run_dir, "ground_truth_meta.json"), "w") as f:
        json.dump({"fingerprint": "abc"}, f)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        f.write("prefix: fake_results_\n")
    # Bulk state the pack must NOT carry.
    np.savez(os.path.join(run_dir, "replay.npz"), big=np.zeros(10))
    with open(os.path.join(run_dir, "train_log.jsonl"), "w") as f:
        f.write('{"event": "episode"}\n')
    return state, mgr


class TestSnapshotPack:
    def test_save_restore_round_trip(self, tmp_path, monkeypatch):
        monkeypatch.setattr(snap, "RUNS", str(tmp_path / "training_results"))
        monkeypatch.setattr(snap, "PACKS", str(tmp_path / "checkpoints"))
        run_dir = tmp_path / "training_results" / "fake_results"
        run_dir.mkdir(parents=True)
        state, _ = _fake_run(str(run_dir))

        snap.save("fake_results")
        pack = tmp_path / "checkpoints" / "fake_results"
        assert (pack / "ckpt" / "step_7" / "extras.json").exists()
        assert not (pack / "ckpt" / "step_3").exists(), "only latest step"
        assert not (pack / "replay.npz").exists()
        assert not (pack / "train_log.jsonl").exists()
        meta = json.loads((pack / "PACK.json").read_text())
        assert meta["step"] == "step_7" and meta["global_step"] == 7

        # Wipe the run dir (fresh clone) and restore.
        import shutil

        shutil.rmtree(run_dir)
        snap.restore("fake_results")
        mgr = CheckpointManager(str(run_dir / "ckpt"))
        template = init_dqn(
            init_params(jax.random.PRNGKey(2), 17, 8, conv_width=8, topk=0.5),
            init_params(jax.random.PRNGKey(3), 17, 8, conv_width=8, topk=0.5),
            DQNConfig(topk=0.5),
        )
        restored, extras, step = mgr.restore(template)
        assert step == 7 and extras["episode"] == 3
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params1)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params1)[0]),
        )
        assert (run_dir / "fake_results_reward.npy").exists()
        assert (run_dir / "ground_truth.npz").exists()

        # Restoring over an existing run dir is a no-op (never clobbers a
        # live run's newer state).
        (run_dir / "marker").write_text("live")
        snap.restore("fake_results")
        assert (run_dir / "marker").exists()
