"""Driver benchmark: solver wall-clock + end-to-end episode throughput.

Primary metric: the full 5000-step ys930 transient solve (the reference's
FEniCS/MUMPS CPU baseline is 109.06 s — training_results/benchmark_results/
smooth_ys930_1.0_0.001_smooth_benchmark.csv row 20; BASELINE.md).  The same
JSON line also carries:
  * the ah93w145 stock-mesh solve (baseline 67.26 s, smooth_ah93w145…csv:19)
  * end-to-end training episode throughput, ms per environment step at
    num_parallel=32 WITH one gradient step per env step — the BASELINE.md
    north star is >=10x the reference's CPU env-step cost (~2.6 s/env-step
    measured for the single-core host-only path in round 1)

Prints ONE JSON line on stdout.

Live training runs are PAUSED (not stopped) for the measurement: a PAUSE
file makes the trainer checkpoint + exit(76); scripts/run_train_loop.sh
holds the relaunch while the PAUSED ack exists, and this process removes the
ack when done, so training resumes losslessly even if the bench dies mid-run
(the `finally` also runs on the deadline path).
"""
import glob
import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_S = 109.06
REF_DRAG = -0.1130622
REF_LIFT = -0.0462851
MESH = "/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf"
AH_BASELINE_S = 67.26  # smooth_ah93w145_1.0_0.001_smooth_benchmark.csv:19
AH_REF_DRAG = -0.1302693
AH_REF_LIFT = -0.0504921
AH_MESH = "/root/reference/xdmf_files/ah93w145_0.14000_triangle.xdmf"
# Round-1 measured cost of the equivalent env step on this host without the
# TPU (FEniCS-style CPU path: Delaunay + 5-snapshot interpolation + probes
# + torch-equivalent grad step) — the BASELINE.md episode-throughput anchor.
EPISODE_BASELINE_S = 2.6
# The remote TPU compile service has shown multi-minute outages; never hang
# the harness — report an honest error line instead.
# 1200 left the large-mesh probe skipped (needs ~420 s of headroom after a
# contended cold compile); 1800 fits the full suite with margin.
DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", "1800"))
REPO = os.path.dirname(os.path.abspath(__file__))


class _Deadline(Exception):
    pass


def _on_alarm(signum, frame):
    raise _Deadline()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _pid_alive(path: str) -> bool:
    try:
        pid = int(open(path).read().strip())
        os.kill(pid, 0)
        return True
    except (OSError, ValueError):
        return False


def pause_trainers(run_root: str | None = None, timeout_s: float = 600.0) -> list[str]:
    """Losslessly pause live training runs before timing; returns the PAUSED
    ack paths to remove in resume_trainers().

    The bench shares one chip and one host core with the long-running
    training loops; contention inflates the setup phase ~9x.  The trainer
    polls for a PAUSE file each sweep, checkpoints, renames it to PAUSED and
    exits 76; run_train_loop.sh holds the relaunch while PAUSED exists.
    Liveness = a beacon pidfile with a live process (covers arbitrarily long
    compiles), falling back to recent train_log.jsonl mtime.  Opt out with
    BENCH_NO_QUIESCE=1.
    """
    if os.environ.get("BENCH_NO_QUIESCE"):
        return []
    if run_root is None:
        run_root = os.path.join(REPO, "training_results")
    # CPU-side quiesce: a long-running oracle/background job can advertise
    # its pid in training_results/ORACLE.pid; SIGSTOP it for the timed
    # section (the 1-core host's scheduler otherwise lets it inflate the
    # host-bound sweep-prep phase — measured 21.5/28.2 vs 15.4-18.2
    # ms/env-step with it stopped).  resume_trainers sends SIGCONT.
    opid = os.path.join(run_root, "ORACLE.pid")
    if os.path.exists(opid):
        import signal

        for tok in open(opid).read().split():
            try:
                os.kill(int(tok), signal.SIGSTOP)
                log(f"stopped background oracle pid {tok}")
            except (OSError, ValueError):
                pass
    pending: dict[str, str] = {}  # PAUSE path -> run dir
    now = time.time()
    for d in sorted(glob.glob(os.path.join(run_root, "*"))):
        if not os.path.isdir(d):
            continue
        jl = os.path.join(d, "train_log.jsonl")
        live = _pid_alive(os.path.join(d, "trainer.pid"))
        if not live:
            try:
                live = now - os.path.getmtime(jl) < 1800
            except OSError:
                live = False
        if live:
            p = os.path.join(d, "PAUSE")
            # The pauser's pid rides along (the trainer's os.replace of
            # PAUSE -> PAUSED preserves content): run_train_loop.sh
            # auto-resumes if this process dies holding the pause, so a
            # crashed bench can no longer stall training across rounds
            # (VERDICT r3: both trainers sat PAUSED for hours).
            with open(p, "w") as f:
                f.write(str(os.getpid()))
            pending[p] = d
    if not pending:
        return []
    log(f"pausing {len(pending)} live training run(s) ...")
    acks: list[str] = []
    # One poll loop over ALL runs: every pending PAUSE gets the full window
    # (sequential per-file waits let the first run starve the rest).
    deadline = time.time() + timeout_s
    while pending and time.time() < deadline:
        for p in list(pending):
            if not os.path.exists(p):
                ack = os.path.join(pending.pop(p), "PAUSED")
                if os.path.exists(ack):
                    acks.append(ack)
        time.sleep(1.0)
    for p, d in pending.items():  # never consumed: don't leave a trap
        try:
            os.remove(p)
        except OSError:
            pass
        log(f"pause timeout on {p} (removed)")
        # Consume/remove race: the trainer may have read PAUSE just before
        # the removal and still be checkpointing — give its exit a moment so
        # the timed section doesn't overlap checkpoint I/O.
        t0 = time.time()
        pid = os.path.join(d, "trainer.pid")
        while time.time() - t0 < 15.0:
            ack = os.path.join(d, "PAUSED")
            if os.path.exists(ack):
                acks.append(ack)
                break
            if not _pid_alive(pid):
                break
            time.sleep(1.0)
    time.sleep(2.0)  # let exiting processes release host/device
    return acks


def resume_trainers(acks: list[str]) -> None:
    for ack in acks:
        try:
            os.remove(ack)
            log(f"released {ack}")
        except OSError:
            pass
    # Wake a SIGSTOPped background oracle (see pause_trainers).
    opid = os.path.join(REPO, "training_results", "ORACLE.pid")
    if os.path.exists(opid):
        import signal

        for tok in open(opid).read().split():
            try:
                os.kill(int(tok), signal.SIGCONT)
                log(f"resumed background oracle pid {tok}")
            except (OSError, ValueError):
                pass


# v5e peak HBM bandwidth; the fused IPCS step is bandwidth-bound (one pass
# over every dense operator per step), so achieved-BW fraction is this
# workload's honest "MFU" (VERDICT r3 #6).
HBM_PEAK_BPS = float(os.environ.get("BENCH_HBM_BW_GBPS", "819")) * 1e9


def _operator_bytes(solver) -> int:
    """HBM bytes the step function streams per iteration: every operator
    leaf is read exactly once per fused step (state vectors are noise)."""
    import jax

    leaves = jax.tree_util.tree_leaves(solver.dev)
    if getattr(solver, "dev_lo", None) is not None:
        leaves += jax.tree_util.tree_leaves(solver.dev_lo)
    return int(sum(getattr(a, "nbytes", 0) for a in leaves))


def _timed_solve(mesh_path: str, precision: str, trials: int = 2):
    """(wall_s, setup_s, drag, lift, op_bytes) for the 5000-step solve."""
    import jax.numpy as jnp

    from meshdqn_tpu.mesh import read_xdmf, smooth
    from meshdqn_tpu.solver import FlowState, IPCSConfig, IPCSSolver

    t0 = time.time()
    mesh = smooth(read_xdmf(mesh_path), 50)
    solver = IPCSSolver(mesh, IPCSConfig(precision=precision))
    setup_s = time.time() - t0

    # Warm up/compile the exact scan used by solve(5000, 1000).  NOTE: on
    # the remote-TPU backend here, block_until_ready does NOT block; a host
    # readback (float()) is the only reliable fence, and identical
    # computations can be memoized — hence distinct initial states below.
    st, d, _ = solver.evolve(solver.initial_state(), 1000)
    float(d[-1])

    walls, out = [], None
    for trial in range(trials):
        init = FlowState(
            u=jnp.full(solver.ndofs_u, 1e-30 * trial, solver.work_dtype),
            p=jnp.zeros(solver.ndofs_p, solver.pressure_dtype),
        )
        t0 = time.time()
        out = solver.solve(5000, save_steps=1000, state=init)
        float(out["drags"][-1])  # force completion (host readback fence)
        walls.append(time.time() - t0)
        log(f"  trial {trial}: {walls[-1]:.2f}s")
    return (
        min(walls),
        setup_s,
        float(out["snap_drags"][-1]),
        float(out["snap_lifts"][-1]),
        _operator_bytes(solver),
    )


def _large_mesh_probe(time_left_s: float) -> dict:
    """Finest-row (res 0.05, ~3.8k verts) banded-CG step timing — the
    large-mesh metric VERDICT r3 #3 asked the driver to record.  Short
    warmed probe (400 steps) extrapolated to the 5000-step solve; skipped
    when the remaining deadline cannot absorb a contended compile."""
    if os.environ.get("BENCH_NO_LARGE") or time_left_s < 420:
        log(f"large-mesh probe skipped (time_left={time_left_s:.0f}s)")
        return {}
    import jax

    if jax.default_backend() != "tpu":
        return {}
    from meshdqn_tpu.mesh import airfoil_polyline, read_xdmf, smooth
    from meshdqn_tpu.mesh.generate import generate_channel_mesh
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    ring = airfoil_polyline(read_xdmf(MESH))
    mesh = smooth(generate_channel_mesh(ring, 0.05), 50)
    cfg = IPCSConfig(
        precision="f32", fused=False, method="cg", cg_chunk=25,
        # Round-4 production setting: block-Jacobi PCG (nb=128 dense
        # RCM-diagonal block inverses) at (6,5) iterations — measured
        # drag-equal to Jacobi (15,12) to 1.1e-5 rel at 500 steps and
        # 1.80x faster per step (scripts/block_precond_study.py).
        cg_iters_u=6, cg_iters_m=5, invert_on_device=True,
        cg_precond="block", cg_block_size=128,
    )
    t0 = time.time()
    IPCSSolver(mesh, cfg)
    setup_cold_s = time.time() - t0
    # Warm rebuild (compiles amortized by the in-process jit cache /
    # persistent disk cache) — the steady-state per-mesh setup cost, same
    # split the fused small-mesh setup reports (setup_warm_s).
    t0 = time.time()
    solver = IPCSSolver(mesh, cfg)
    setup_s = time.time() - t0
    # Warm the chunked evolve (compile), then time a 400-step run.
    st, d, _ = solver.evolve(solver.initial_state(), 25)
    float(d[-1])
    t0 = time.time()
    st, d, _ = solver.evolve(st, 400)
    float(d[-1])
    step_ms = (time.time() - t0) / 400 * 1000.0
    est_5000 = step_ms * 5.0
    log(
        f"large mesh ({mesh.num_vertices} verts): {step_ms:.1f} ms/step, "
        f"est 5000-step {est_5000:.0f}s (ref finest 403.15s CPU)"
    )
    return {
        "large_mesh_vertices": int(mesh.num_vertices),
        "large_mesh_step_ms": round(step_ms, 2),
        "large_mesh_est_5000step_s": round(est_5000, 1),
        "large_mesh_setup_s": round(setup_s, 1),
        "large_mesh_setup_cold_s": round(setup_cold_s, 1),
        "vs_baseline_large_mesh": round(403.15 / est_5000, 2),
        "large_mesh_baseline_s": 403.15,
    }


def _episode_throughput() -> dict:
    """End-to-end training throughput: ms per env step at num_parallel=32,
    one gradient step per env step, measured over full sweeps after a
    compile/replay warmup.  Uses the committed ys930 ground-truth pack so no
    5000-step GT solve is paid here."""
    gt_path = None
    for cand in (
        os.path.join(REPO, "training_results/ys930_results/ground_truth.npz"),
        os.path.join(REPO, "checkpoints/ys930_results/ground_truth.npz"),
    ):
        if os.path.exists(cand):
            gt_path = cand
            break
    if gt_path is None:
        return {}
    import shutil
    import tempfile

    from meshdqn_tpu.env import GroundTruth
    from meshdqn_tpu.train import Trainer
    from meshdqn_tpu.utils import Config

    cfg = Config.from_yaml(os.path.join(REPO, "configs/ys930.yaml"))
    cfg.agent.num_parallel = 32
    cfg.agent.checkpoint_every = 10 ** 9  # steady-state sweeps, no ckpt I/O
    cfg.agent.write_every = 10 ** 9
    tmp = tempfile.mkdtemp(prefix="bench_episodes_")
    try:
        cfg.save_dir = tmp
        cfg.prefix = "bench_"
        gt = GroundTruth.load(gt_path)
        trainer = Trainer(cfg, ground_truth=gt, resume=False)
        warm = 4 * cfg.agent.num_parallel  # compiles + replay fill
        trainer.train(max_steps=warm)
        # Two measured windows, best taken: the remote-tunnel worker has
        # multi-second latency excursions (r5 measured the same binary
        # spanning 15.4-25.5 ms/env-step across runs); the minimum is the
        # code's capability, the rest is link weather.
        measured = 20 * cfg.agent.num_parallel
        ms_trials = []
        start = warm
        for _ in range(2):
            t0 = time.time()
            trainer.train(max_steps=start + measured)
            wall = time.time() - t0
            steps = trainer.state.global_step - start
            if steps <= 0:
                return {}
            ms_trials.append(wall / steps * 1000.0)
            start += measured
        ms = min(ms_trials)
        steps = measured
        log(
            f"episode throughput: {ms:.1f} ms/env-step over {steps} steps "
            f"(trials: {[round(m, 1) for m in ms_trials]})"
        )
        return {
            "episode_ms_per_env_step": round(ms, 2),
            "episode_env_steps_per_s": round(1000.0 / ms, 2),
            "episode_num_parallel": cfg.agent.num_parallel,
            "episode_baseline_s_per_step": EPISODE_BASELINE_S,
            "vs_baseline_episode_throughput": round(
                EPISODE_BASELINE_S / (ms / 1000.0), 1
            ),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _episode_throughput_subprocess() -> dict:
    """Run _episode_throughput in a FRESH process and parse its JSON line.

    The axon remote worker degrades with accumulated solver instances in
    one client (docs/AXON.md): after this bench's four solve sections the
    in-process episode measurement reads 21-28 ms/env-step where a fresh
    client measures 15.4-18.2 on identical code (r5).  A subprocess gives
    the episode metric its own client, which is also how training actually
    runs (cli.train is a dedicated process)."""
    import json as _json
    import subprocess
    import sys

    env = dict(os.environ)
    env["BENCH_EPISODE_ONLY"] = "1"
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    for line in res.stdout.splitlines():
        if "throughput" in line:
            log(line.strip())  # forward the trials detail to this log
    for line in reversed(res.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return _json.loads(line)
    log(f"episode subprocess produced no JSON (rc={res.returncode}); "
        "falling back in-process")
    return _episode_throughput()


def main():
    import jax

    if os.environ.get("BENCH_EPISODE_ONLY"):
        import json as _json

        print(_json.dumps(_episode_throughput()), flush=True)
        return

    backend = jax.default_backend()
    precision = "f32" if backend == "tpu" else "f64"
    log(f"backend={backend} precision={precision}")

    # Episode throughput FIRST, in a fresh subprocess: the remote worker
    # degrades with accumulated solver instances SERVER-side (docs/AXON.md)
    # — measured 16.9 ms/env-step before this bench's four solve sections
    # vs 24.1 on identical code immediately after them (r5).
    episode = {}
    if backend == "tpu":
        try:
            episode = _episode_throughput_subprocess()
        except Exception as e:
            log(f"episode throughput measurement failed: {e!r}")

    from meshdqn_tpu.mesh import read_xdmf, smooth
    from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

    # f32 path: fused dense operators composed ON DEVICE with f64-residual
    # iterative refinement (solver/fused.py:build_fused_refined) — operator
    # entries match the exact f64 composition to ~1e-12 rel; setup is host
    # assembly (~0.3 s) + three jitted compose modules (compile cached).
    t_begin = time.time()
    log("ys930 5000-step solve:")
    wall, setup_s, drag, lift, op_bytes = _timed_solve(MESH, precision)
    rel = abs((drag - REF_DRAG) / REF_DRAG)
    rel_lift = abs((lift - REF_LIFT) / REF_LIFT)
    log(f"wall={wall:.2f}s drag={drag:.7f} rel_err={rel:.2e} lift_rel={rel_lift:.2e}")
    # Achieved HBM bandwidth of the fused step (bandwidth-bound -> this is
    # the workload's "MFU"): operators streamed once per step.
    step_bw = op_bytes / (wall / 5000.0)
    bw_frac = step_bw / HBM_PEAK_BPS
    log(
        f"fused step: {op_bytes / 1e6:.1f} MB operators/step, achieved "
        f"{step_bw / 1e9:.0f} GB/s = {100 * bw_frac:.0f}% of HBM roofline"
    )

    # Warm per-mesh setup: what every SUBSEQUENT solver build in the same
    # process costs (training remeshes, deploy rebuilds, sweep rows).  The
    # cold-minus-warm difference is compile (+ first-composition) cost —
    # reported separately so a compile regression can't hide inside setup_s
    # (VERDICT r3 #6: r2->r3 cold setup went 5.3s -> 69.5s unexplained).
    t0 = time.time()
    IPCSSolver(smooth(read_xdmf(MESH), 50), IPCSConfig(precision=precision))
    setup_warm_s = time.time() - t0
    setup_compile_s = max(0.0, setup_s - setup_warm_s)
    log(
        f"setup: cold {setup_s:.1f}s = compile {setup_compile_s:.1f}s + "
        f"composition/assembly {setup_warm_s:.1f}s (warm rebuild)"
    )

    log("ah93w145 5000-step solve:")
    ah_wall, ah_setup, ah_drag, ah_lift, _ = _timed_solve(AH_MESH, precision)
    ah_rel = abs((ah_drag - AH_REF_DRAG) / AH_REF_DRAG)
    ah_rel_lift = abs((ah_lift - AH_REF_LIFT) / AH_REF_LIFT)
    log(f"wall={ah_wall:.2f}s drag={ah_drag:.7f} rel_err={ah_rel:.2e}")

    if not episode:
        try:
            episode = _episode_throughput()
        except Exception as e:  # never lose the solver metrics to the RL path
            log(f"episode throughput measurement failed: {e!r}")

    large = {}
    try:
        large = _large_mesh_probe(DEADLINE_S - (time.time() - t_begin))
    except Exception as e:
        log(f"large-mesh probe failed: {e!r}")

    print(
        json.dumps(
            {
                "metric": "ys930_5000step_ipcs_solve_wall",
                "value": round(wall, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / wall, 2),
                "baseline_s": BASELINE_S,
                "backend": backend,
                "precision": precision,
                "per_step_ms": round(wall / 5.0, 3),
                "drag": drag,
                "drag_rel_err_vs_reference": rel,
                "lift_rel_err_vs_reference": rel_lift,
                "setup_s": round(setup_s, 1),
                "setup_warm_s": round(setup_warm_s, 1),
                "setup_compile_s": round(setup_compile_s, 1),
                "fused_step_operator_mb": round(op_bytes / 1e6, 1),
                "fused_step_achieved_gbps": round(step_bw / 1e9, 1),
                "fused_step_hbm_roofline_frac": round(bw_frac, 3),
                "hbm_peak_gbps": round(HBM_PEAK_BPS / 1e9, 0),
                "ah93w145_5000step_solve_wall_s": round(ah_wall, 3),
                "ah93w145_vs_baseline": round(AH_BASELINE_S / ah_wall, 2),
                "ah93w145_baseline_s": AH_BASELINE_S,
                "ah93w145_drag_rel_err": ah_rel,
                "ah93w145_lift_rel_err": ah_rel_lift,
                **episode,
                **large,
            }
        )
    )


if __name__ == "__main__":
    # Pause the trainers BEFORE arming the deadline: a slow quiesce must not
    # eat the solve budget, and the finally below releases the pause on
    # every path (including the deadline).  The BENCH_EPISODE_ONLY
    # subprocess skips the quiesce — its parent bench already holds it.
    _acks = [] if os.environ.get("BENCH_EPISODE_ONLY") else pause_trainers()
    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(DEADLINE_S)
    try:
        main()
    except _Deadline:
        print(
            json.dumps(
                {
                    "metric": "ys930_5000step_ipcs_solve_wall",
                    "value": -1,
                    "unit": "s",
                    "vs_baseline": 0,
                    "error": f"TPU backend unresponsive within {DEADLINE_S}s "
                    "(remote compile service outage); last verified result "
                    "(2026-08-19): 5.02 s wall (21.7x baseline), drag rel "
                    "err 1.6e-5, lift rel 2.6e-4",
                }
            )
        )
    finally:
        signal.alarm(0)
        resume_trainers(_acks)
