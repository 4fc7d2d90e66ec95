"""bench.py trainer-quiesce: STOP-file semantics without a live trainer.

The bench quiesces live training runs by dropping a STOP file the trainer
consumes at its next sweep (trainer._maybe_recycle).  These tests cover the
host-side logic: live-run detection, the consume-wait, and the
no-lingering-STOP guarantee on timeout (a leftover STOP would abort the
next launched run on sight).
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


def _mk_run(root, name, live):
    d = os.path.join(root, name)
    os.makedirs(d)
    jl = os.path.join(d, "train_log.jsonl")
    with open(jl, "w") as f:
        f.write("{}\n")
    if not live:
        old = time.time() - 3600
        os.utime(jl, (old, old))
    return d


class TestQuiesce:
    def test_stale_run_gets_no_stop(self, tmp_path, monkeypatch):
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d = _mk_run(str(tmp_path), "stale_run", live=False)
        bench.quiesce_trainers(run_root=str(tmp_path), timeout_s=1.0)
        assert not os.path.exists(os.path.join(d, "STOP"))

    def test_live_run_stop_consumed(self, tmp_path, monkeypatch):
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d = _mk_run(str(tmp_path), "live_run", live=True)
        stop = os.path.join(d, "STOP")

        def fake_trainer():
            while not os.path.exists(stop):
                time.sleep(0.05)
            os.remove(stop)

        t = threading.Thread(target=fake_trainer, daemon=True)
        t.start()
        t0 = time.time()
        bench.quiesce_trainers(run_root=str(tmp_path), timeout_s=30.0)
        t.join(timeout=5)
        assert not os.path.exists(stop)
        assert time.time() - t0 < 30.0

    def test_timeout_removes_stop(self, tmp_path, monkeypatch):
        monkeypatch.delenv("BENCH_NO_QUIESCE", raising=False)
        d = _mk_run(str(tmp_path), "hung_run", live=True)
        bench.quiesce_trainers(run_root=str(tmp_path), timeout_s=0.1)
        assert not os.path.exists(os.path.join(d, "STOP"))

    def test_opt_out(self, tmp_path, monkeypatch):
        monkeypatch.setenv("BENCH_NO_QUIESCE", "1")
        d = _mk_run(str(tmp_path), "live_run", live=True)
        bench.quiesce_trainers(run_root=str(tmp_path), timeout_s=1.0)
        assert not os.path.exists(os.path.join(d, "STOP"))
