"""bench.py trainer pause/resume: PAUSE/PAUSED semantics without a live trainer.

The bench pauses live training runs by dropping a PAUSE file; the trainer
checkpoints, renames it PAUSED and exits 76 (trainer._maybe_recycle), and
run_train_loop.sh holds the relaunch while the ack exists.  These tests
cover the host-side logic: liveness detection (pidfile beacon + mtime
fallback), the single-poll consume-wait across multiple runs, the
no-lingering-PAUSE guarantee on timeout, and ack release.
"""
from __future__ import annotations

import importlib.util
import os
import threading
import time

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "bench.py")
_spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _mk_run(root, name, live, pid=None):
    d = os.path.join(root, name)
    os.makedirs(d)
    jl = os.path.join(d, "train_log.jsonl")
    with open(jl, "w") as f:
        f.write("{}\n")
    if not live:
        old = time.time() - 3600
        os.utime(jl, (old, old))
    if pid is not None:
        with open(os.path.join(d, "trainer.pid"), "w") as f:
            f.write(str(pid))
    return d


def _fake_trainer(run_dir):
    """Consume PAUSE like trainer._maybe_recycle: rename to PAUSED."""
    p = os.path.join(run_dir, "PAUSE")
    while not os.path.exists(p):
        time.sleep(0.05)
    os.replace(p, os.path.join(run_dir, "PAUSED"))


class TestPause:
    def test_stale_run_gets_no_pause(self, tmp_path, monkeypatch):
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d = _mk_run(str(tmp_path), "stale_run", live=False)
        acks = bench.pause_trainers(run_root=str(tmp_path), timeout_s=1.0)
        assert acks == []
        assert not os.path.exists(os.path.join(d, "PAUSE"))

    def test_stale_mtime_live_pid_gets_paused(self, tmp_path, monkeypatch):
        # A trainer stuck in a >30 min compile has a stale jsonl but a live
        # pid — the beacon must win (ADVICE r2: mtime window was narrower
        # than the watchdog's own grace).
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d = _mk_run(str(tmp_path), "compiling_run", live=False, pid=os.getpid())
        t = threading.Thread(target=_fake_trainer, args=(d,), daemon=True)
        t.start()
        acks = bench.pause_trainers(run_root=str(tmp_path), timeout_s=30.0)
        t.join(timeout=5)
        assert acks == [os.path.join(d, "PAUSED")]

    def test_live_run_pause_consumed_and_released(self, tmp_path, monkeypatch):
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d = _mk_run(str(tmp_path), "live_run", live=True)
        t = threading.Thread(target=_fake_trainer, args=(d,), daemon=True)
        t.start()
        t0 = time.time()
        acks = bench.pause_trainers(run_root=str(tmp_path), timeout_s=30.0)
        t.join(timeout=5)
        assert time.time() - t0 < 30.0
        ack = os.path.join(d, "PAUSED")
        assert acks == [ack] and os.path.exists(ack)
        bench.resume_trainers(acks)
        assert not os.path.exists(ack)  # run loop released

    def test_all_runs_share_one_poll_window(self, tmp_path, monkeypatch):
        # Two live runs; the SECOND consumes quickly while the first hangs.
        # The old sequential per-file wait would burn the whole window on
        # run 1 and give run 2 ~nothing; the single poll loop must still
        # collect run 2's ack.
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d1 = _mk_run(str(tmp_path), "a_hung_run", live=True)
        d2 = _mk_run(str(tmp_path), "b_live_run", live=True)
        t = threading.Thread(target=_fake_trainer, args=(d2,), daemon=True)
        t.start()
        acks = bench.pause_trainers(run_root=str(tmp_path), timeout_s=4.0)
        t.join(timeout=5)
        assert os.path.join(d2, "PAUSED") in acks
        # hung run: PAUSE removed, no trap left behind
        assert not os.path.exists(os.path.join(d1, "PAUSE"))

    def test_timeout_removes_pause(self, tmp_path, monkeypatch):
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d = _mk_run(str(tmp_path), "hung_run", live=True)
        acks = bench.pause_trainers(run_root=str(tmp_path), timeout_s=0.1)
        assert not os.path.exists(os.path.join(d, "PAUSE"))
        assert acks == []

    def test_timeout_race_collects_late_ack(self, tmp_path, monkeypatch):
        # Trainer consumes PAUSE *after* the timeout removal started: the
        # grace wait must still collect the ack so resume releases it.
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d = _mk_run(str(tmp_path), "racy_run", live=True, pid=os.getpid())

        def late_trainer():
            time.sleep(1.0)
            ack = os.path.join(d, "PAUSED")
            with open(ack, "w"):
                pass

        t = threading.Thread(target=late_trainer, daemon=True)
        t.start()
        acks = bench.pause_trainers(run_root=str(tmp_path), timeout_s=0.1)
        t.join(timeout=5)
        assert acks == [os.path.join(d, "PAUSED")]

    def test_opt_out(self, tmp_path, monkeypatch):
        monkeypatch.setenv("BENCH_NO_QUIESCE", "1")
        d = _mk_run(str(tmp_path), "live_run", live=True)
        assert bench.pause_trainers(run_root=str(tmp_path), timeout_s=1.0) == []
        assert not os.path.exists(os.path.join(d, "PAUSE"))

    def test_pause_file_records_pauser_pid(self, tmp_path, monkeypatch):
        # bench.py writes its own pid into PAUSE so run_train_loop.sh can
        # detect a dead pauser; the trainer's os.replace preserves content.
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d = _mk_run(str(tmp_path), "live_run", live=True)
        t = threading.Thread(target=_fake_trainer, args=(d,), daemon=True)
        t.start()
        acks = bench.pause_trainers(run_root=str(tmp_path), timeout_s=30.0)
        t.join(timeout=5)
        assert acks and int(open(acks[0]).read().strip()) == os.getpid()
        bench.resume_trainers(acks)


_PAUSE_WAIT = os.path.join(
    os.path.dirname(_BENCH), "scripts", "pause_wait.sh"
)


def _run_pause_wait(run_dir, env=None, timeout=30):
    import subprocess

    e = dict(os.environ, PAUSE_POLL_S="0.2")
    if env:
        e.update(env)
    return subprocess.run(
        ["bash", _PAUSE_WAIT, run_dir],
        env=e, timeout=timeout, capture_output=True,
    )


class TestPausedTTL:
    """run_train_loop.sh's pause hold (scripts/pause_wait.sh) must never
    stall a run forever: VERDICT r3 found both trainers sat on a dead
    pauser's PAUSED ack for hours."""

    def test_dead_pauser_auto_resumes(self, tmp_path):
        d = str(tmp_path)
        ack = os.path.join(d, "PAUSED")
        with open(ack, "w") as f:
            f.write("999999999")  # beyond pid_max: guaranteed dead
        old = time.time() - 120  # older than the dead grace
        os.utime(ack, (old, old))
        t0 = time.time()
        _run_pause_wait(d)
        assert not os.path.exists(ack)
        assert time.time() - t0 < 10

    def test_ttl_exceeded_auto_resumes(self, tmp_path):
        # No pid in the ack (legacy empty PAUSED): TTL is the only escape.
        d = str(tmp_path)
        ack = os.path.join(d, "PAUSED")
        with open(ack, "w"):
            pass
        old = time.time() - 3600
        os.utime(ack, (old, old))
        t0 = time.time()
        _run_pause_wait(d)
        assert not os.path.exists(ack)
        assert time.time() - t0 < 10

    def test_live_pauser_holds_until_release(self, tmp_path):
        # Fresh ack owned by a live pid (us): the wait must HOLD, and exit
        # promptly once the pauser removes the ack.
        d = str(tmp_path)
        ack = os.path.join(d, "PAUSED")
        with open(ack, "w") as f:
            f.write(str(os.getpid()))

        def release():
            time.sleep(1.0)
            os.remove(ack)

        t = threading.Thread(target=release, daemon=True)
        t0 = time.time()
        t.start()
        _run_pause_wait(d)
        t.join(timeout=5)
        elapsed = time.time() - t0
        assert 0.9 < elapsed < 10
