"""Tracing / profiling utilities.

The reference's only instrumentation is ad-hoc `time.time()` spans and a
dolfin Timer around the final deploy solve (SURVEY.md §5: Env2DAirfoil.py:114,
deploy_dqn.py:497-505).  Here:

* `Timer` — accumulating named phase timers with a report;
* `timed` — context manager for one span;
* `trace` — context manager around `jax.profiler.trace` producing a
  TensorBoard-loadable device trace when supported by the backend;
* `force_sync` — a host-readback fence that works on backends where
  `block_until_ready` does not actually block (the remote-TPU tunnel used
  in this environment).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


def force_sync(x) -> float:
    """Reliable completion fence: a host readback of one element."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


class Timer:
    """Accumulating phase timers.

    >>> t = Timer()
    >>> with t("assembly"): ...
    >>> with t("solve"): ...
    >>> t.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                force_sync(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:30s} {tot:9.3f}s  x{n:<6d} {tot / n * 1e3:9.2f} ms/call")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {k: {"total_s": self.totals[k], "count": self.counts[k]} for k in self.totals}


@contextlib.contextmanager
def timed(name: str, out: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if out is not None:
        out[name] = dt
    else:
        print(f"[timed] {name}: {dt:.3f}s")


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace via jax.profiler (TensorBoard format).  No-ops politely
    if the backend cannot trace (e.g. the remote tunnel)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
