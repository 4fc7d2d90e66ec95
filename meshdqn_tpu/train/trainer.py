"""DQN training driver.

Single-program replacement for the reference's Ray actor topology
(airfoil_dqn.py:315-514): where the reference wires 12 rollout workers, a
parameter server, gradient workers, a replay actor and a metrics actor
through RPC, here one process steps `num_parallel` environments round-robin,
selects actions with a batched device call, and applies one jitted
double-DQN gradient step per environment transition.  The asynchronous
first-ready-gradient application (airfoil_dqn.py:331-336) becomes ordinary
synchronous SGD — equivalent-or-better learning dynamics and the idiomatic
single-program TPU design (SURVEY.md §5 communication backend).  Multi-chip
data parallelism shards the replay batch instead (parallel/dp.py).

Mirrored behaviours:
* epsilon-greedy with eps = end + (start-end) exp(-steps/decay)
  (airfoil_dqn.py:455), one shared global step counter;
* exploration samples uniformly over all N_closest+1 actions including
  do-nothing (airfoil_dqn.py:463);
* transitions push (state, action, next_state|None, reward)
  (airfoil_dqn.py:480-482);
* one optimize call per env step, skipped until the buffer holds a batch
  (airfoil_dqn.py:315-319);
* metrics artifacts + reward plot every 5 episodes, checkpoints every
  episode (airfoil_dqn.py:500-503).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..env import AirfoilEnv, GroundTruth
from ..models import init_params
from ..rl import (
    DQNConfig,
    ReplayBuffer,
    epsilon,
    init_dqn,
)
from ..utils import Config
from .checkpoint import CheckpointManager
from .metrics import MetricsRecorder

REPLAY_CAPACITY = 10_000  # reference default (airfoil_dqn.py:412); see
# AgentConfig.replay_capacity for the per-run override.


@dataclass
class TrainerState:
    global_step: int = 0
    episode: int = 0


class Trainer:
    def __init__(
        self,
        config: Config,
        ground_truth: GroundTruth | None = None,
        resume: bool = True,
        data_parallel: bool | None = None,
    ):
        """data_parallel: None = auto (on when >1 device is visible).  When
        on, the replay batch is sharded over a 'dp' device mesh and gradients
        all-reduce with lax.pmean (parallel/dp.py); params stay replicated."""
        self.config = config
        agent, opt, eps = config.agent, config.optimizer, config.epsilon
        self.save_dir = os.path.join(config.save_dir, config.prefix.rstrip("_"))
        os.makedirs(self.save_dir, exist_ok=True)
        config.to_yaml(os.path.join(self.save_dir, "config.yaml"))

        # Ground truth: compute once, persist next to the run artifacts
        # (replaces the snapshots/*.npy scheme of Env2DAirfoil.py:432-449).
        # A fingerprint sidecar guards against silently training on a stale
        # cache after the flow/snapshot config changes under the same prefix.
        from .gtcache import load_or_compute_ground_truth

        self.gt = load_or_compute_ground_truth(
            config, self.save_dir, ground_truth
        )

        # One shared SnapshotTransfer: the source mesh/snapshots are common,
        # and sharing it lets the sweep batch all envs' fused device passes
        # into single vmapped calls (one tunnel round-trip per sweep).
        from ..transfer import SnapshotTransfer

        self._shared_transfer = SnapshotTransfer(
            self.gt.mesh, self.gt.snapshots, window_budget=agent.N_closest
        )
        self.envs = [
            AirfoilEnv(config, ground_truth=self.gt, transfer=self._shared_transfer)
            for _ in range(agent.num_parallel)
        ]

        n_actions = agent.N_closest + 1
        n_feat = 2 + 3 * (agent.solver_steps // agent.save_steps)
        key = jax.random.PRNGKey(config.seed)
        k1, k2 = jax.random.split(key)
        p1 = init_params(k1, n_feat, n_actions, conv_width=128, topk=0.1)
        p2 = init_params(k2, n_feat, n_actions, conv_width=128, topk=0.1)
        self.dqn_cfg = DQNConfig(
            lr=opt.lr,
            weight_decay=opt.weight_decay,
            gamma=eps.gamma,
            target_update=agent.target_update,
            topk=0.1,
            head=agent.head,
            grad_clip=opt.grad_clip,
            target_mode=agent.target_mode,
            double=agent.double,
            target_clip=opt.target_clip,
            cql_alpha=opt.cql_alpha,
        )
        self.dqn = init_dqn(p1, p2, self.dqn_cfg)
        # Multi-chip data parallelism (decided early: it picks the replay
        # backend) requires the batch to divide evenly over the devices.
        divisible = opt.batch_size % jax.device_count() == 0
        if data_parallel is None:
            data_parallel = jax.device_count() > 1 and divisible
        self.data_parallel = (
            data_parallel and jax.device_count() > 1 and divisible
        )
        capacity = getattr(agent, "replay_capacity", REPLAY_CAPACITY)
        if self.data_parallel:
            # dp mode shards host-sampled batches over the mesh.
            self.replay = ReplayBuffer(
                capacity, agent.N_closest, n_feat, agent.edge_budget
            )
        else:
            # Single-device: device-resident ring; gradient batches are
            # gathered on device by index (~5 KB of indices per sweep
            # instead of ~40 MB of padded batches over the tunnel).
            from ..rl import DeviceReplay

            self.replay = DeviceReplay(
                capacity, agent.N_closest, n_feat, agent.edge_budget
            )
        self.batch_size = opt.batch_size
        self.rng = np.random.default_rng(config.seed)

        self._pending_batches: list = []
        self.metrics = MetricsRecorder(self.save_dir, config.prefix)
        from ..utils import JsonLogger

        self.jsonlog = JsonLogger(os.path.join(self.save_dir, "train_log.jsonl"))
        self.ckpt = CheckpointManager(os.path.join(self.save_dir, "ckpt"))
        # Best-policy snapshot: whenever the 1000-episode reward moving
        # average makes a new high at a checkpoint boundary, the nets are
        # also saved to ckpt_best/.  Late-training collapse (round 3's ys930
        # run peaked at MA +0.88 @10.3k episodes then degraded to -1.55 @40k
        # with only the LATEST checkpoint retained) can no longer destroy
        # the deliverable policy.
        self.ckpt_best = CheckpointManager(
            os.path.join(self.save_dir, "ckpt_best"), max_to_keep=1
        )
        self._best_ma: float = float("-inf")
        self.best_window = 1000  # episodes in the best-policy moving average
        # Deploy-aware model selection (see AgentConfig.probe_every): the
        # greedy removals-within-threshold count is the deliverable metric
        # (deploy_dqn.py:496-517 verifies removals, not training reward),
        # and it is anti-correlated with reward once the policy discovers
        # the do-nothing farm.  ckpt_best_deploy/ tracks its high water.
        self.probe_every = int(getattr(agent, "probe_every", 0))
        self.ckpt_best_deploy = CheckpointManager(
            os.path.join(self.save_dir, "ckpt_best_deploy"), max_to_keep=1
        )
        self._best_deploy: tuple[int, float] = (-1, float("-inf"))
        self._probe_env = None
        self.state = TrainerState()
        self.plot_every = max(25, agent.write_every)
        self.write_every = agent.write_every
        self.checkpoint_every = agent.checkpoint_every
        self._last_saved_episode = -1

        # The experimental axon PJRT client retains the host copy of EVERY
        # host->device transfer (docs/AXON.md: ~100% of H2D bytes leak, and
        # jax.clear_caches() does not free them), so a long training process
        # grows without bound (~30 GB/h at 32 envs).  Mitigation: when RSS
        # crosses the watermark, save EVERYTHING (checkpoint + replay ring)
        # and exit(75); run_train_loop.sh restarts the process, which
        # resumes losslessly.
        self._rss_limit_kb = (
            float(os.environ.get("MESHDQN_RSS_LIMIT_GB", "60")) * 1024 * 1024
        )
        self._replay_path = os.path.join(self.save_dir, "replay.npz")
        self._infra_fail_streak = 0

        if resume:
            restored = self.ckpt.restore(self.dqn)
            if restored is not None:
                self.dqn, extras, step = restored
                self.state.global_step = int(extras["global_step"])
                self.state.episode = int(extras["episode"])
                self.metrics.load()
                # Metric arrays are packed/written on their own cadence and
                # can run AHEAD of the checkpoint counters (autopack between
                # a write and a save); truncate so resumed episodes are not
                # recorded twice (ADVICE r3: ah93w145 pack carried 11 extra
                # episodes / ~510 extra losses vs its checkpoint).
                self.metrics.truncate(
                    episodes=self.state.episode,
                    steps=self.state.global_step,
                    losses=extras.get("n_losses"),
                )
                self._best_ma = float(extras.get("best_ma", float("-inf")))
                self._best_deploy = (
                    int(extras.get("best_deploy_removals", -1)),
                    float(extras.get("best_deploy_reward", float("-inf"))),
                )
                if os.path.exists(self._replay_path):
                    ok = self.replay.load(self._replay_path)
                    self.jsonlog.log(
                        "replay_restore", ok=ok, size=len(self.replay)
                    )

        if self.data_parallel:
            from ..parallel import make_dp_train_step, make_mesh, replicate

            self.mesh = make_mesh()
            self._dp_step = make_dp_train_step(self.mesh, self.dqn_cfg)
            self.dqn = replicate(self.mesh, self.dqn)

    # ------------------------------------------------------------------
    def _optimize(self):
        """Queue one gradient step (airfoil_dqn.py:315-319 skip-until-batch).

        The batch indices are DRAWN now — against the buffer size exactly as
        the reference's per-transition DataWorker would see it — but the
        device call is deferred: `_flush_optimize` scans all queued batches
        through `train_step_many_idx` (on-device index gather from the
        device-resident ring) in ONE tunnel round-trip per sweep,
        arithmetically identical to sequential `train_step` calls."""
        if len(self.replay) < self.batch_size:
            return
        if not self.data_parallel:
            # Device replay: queue INDICES now (same rng call point as host
            # sampling); the flush gathers them on device.
            self._pending_batches.append(
                self.replay.sample_indices(self.batch_size, self.rng)
            )
            return
        # dp mode: host-sample the batch and shard it over the device mesh
        # immediately (the collective path is latency-tolerant in tests and
        # K-scan sharding buys nothing on a virtual mesh).
        self._pending_batches.append(
            self.replay.sample_np(self.batch_size, self.rng)
        )
        self._flush_optimize()

    def _flush_optimize(self):
        if not self._pending_batches:
            return
        batches = self._pending_batches
        self._pending_batches = []
        if not self.data_parallel:
            from ..rl import train_step_idx, train_step_many_idx

            self.replay.flush()
            if len(batches) < len(self.envs):
                # Warm-up partial sweep: per-batch single-step calls reuse
                # one compiled module for any odd K.
                for idx in batches:
                    self.dqn, loss = train_step_idx(
                        self.dqn, self.replay.store, jnp.asarray(idx),
                        self.dqn_cfg,
                    )
                    self.metrics.add_loss(loss)
            else:
                self.dqn, losses = train_step_many_idx(
                    self.dqn,
                    self.replay.store,
                    jnp.asarray(np.stack(batches)),
                    self.dqn_cfg,
                )
                for i in range(len(batches)):
                    self.metrics.add_loss(losses[i])
            return
        from ..parallel import shard_batch

        import jax.tree_util as jtu

        for b in batches:
            dev = jtu.tree_map(jnp.asarray, b)
            self.dqn, loss = self._dp_step(
                self.dqn, shard_batch(self.mesh, dev)
            )
            self.metrics.add_loss(loss)

    # ------------------------------------------------------------------
    def train(self, num_episodes: int | None = None, max_steps: int | None = None):
        """Run episodes round-robin over the parallel envs."""
        cfg = self.config
        eps_cfg = cfg.epsilon
        num_episodes = num_episodes or cfg.agent.episodes
        t_start = time.time()

        env_states = [env.reset() for env in self.envs]
        ep_rewards = [[] for _ in self.envs]
        ep_actions = [[] for _ in self.envs]
        n_envs = len(self.envs)
        timing = os.environ.get("MESHDQN_TIMING") == "1"
        tacc = {"select": 0.0, "prep": 0.0, "dev": 0.0, "gather": 0.0,
                "complete": 0.0, "opt": 0.0, "done": 0.0, "sweeps": 0}

        while self.state.episode < num_episodes:
            _t0 = time.time()
            # Phase 1: epsilon-greedy decisions for the whole sweep; all
            # exploit actions computed in ONE batched device call (the
            # reference pays one parameter-server RPC per env per step,
            # airfoil_dqn.py:458-463).
            eps_sweep = [
                epsilon(
                    self.state.global_step + i,
                    eps_cfg.start,
                    eps_cfg.end,
                    eps_cfg.decay,
                )
                for i in range(n_envs)
            ]
            explore = [self.rng.random() <= e for e in eps_sweep]
            actions = [
                int(self.rng.integers(0, self.config.agent.N_closest + 1))
                if explore[i]
                else None
                for i in range(n_envs)
            ]
            if not all(explore):
                from ..rl import select_actions_batched

                # Always evaluate the FULL env batch (one static shape, one
                # compilation) and pick out the exploiting envs' actions.
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *env_states
                )
                if self.data_parallel and n_envs % jax.device_count() == 0:
                    # Shard the env batch of the forward pass over the dp
                    # mesh too (VERDICT r1: only the replay batch was
                    # sharded); argmax is per-graph so GSPMD splits the
                    # whole evaluation with zero communication.
                    from jax.sharding import NamedSharding, PartitionSpec

                    sh = NamedSharding(self.mesh, PartitionSpec("dp"))
                    stacked = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sh), stacked
                    )
                chosen = np.asarray(
                    select_actions_batched(
                        self.dqn.params1, stacked, topk=self.dqn_cfg.topk
                    )
                )
                for i in range(n_envs):
                    if actions[i] is None:
                        actions[i] = int(chosen[i])
            if timing:
                tacc["select"] += time.time() - _t0; _t0 = time.time()

            # Phase 2 (host): mesh surgery + device-call inputs for every
            # env; Phase 3 (device): ONE batched fused pass for all the
            # removing envs and one batched feature gather for the
            # window-shift envs — single tunnel round-trips per sweep
            # instead of one per env.
            preps = [env.prepare_step(actions[i]) for i, env in enumerate(self.envs)]
            if timing:
                tacc["prep"] += time.time() - _t0; _t0 = time.time()
            results: dict[int, tuple] = {}
            removal_idx = [i for i, p in enumerate(preps) if p.inputs is not None]
            gather_idx = [
                i for i, p in enumerate(preps) if p.post_window is not None
            ]
            # Dispatch BOTH independent device calls before either host
            # readback: removal products and window gathers touch disjoint
            # envs (a step is either a removal or a window shift), so the
            # two tunnel round-trips pipeline instead of serializing.
            prod_handle = None
            infra_fail = False
            if removal_idx:
                try:
                    prod_handle = self._shared_transfer.run_products_batched_begin(
                        [preps[i].inputs for i in removal_idx],
                        pad_to=n_envs,
                        # f32 wire: halves the dominant per-sweep upload;
                        # the env path reads only the f32 `small` packing,
                        # so this adds no observable error (docs/AXON.md).
                        wire="f32",
                    )
                except Exception:
                    infra_fail = True
            gather_handle = None
            if gather_idx:
                gather_handle = self._shared_transfer.gather_window_batched_begin(
                    [
                        (self.envs[i]._dev_snaps, preps[i].post_window)
                        for i in gather_idx
                    ],
                    pad_to=n_envs,
                )
            # Deferred optimizer flush (sweep pipelining): the gradient
            # batches queued during the PREVIOUS sweep's completes are
            # dispatched here, after this sweep's batched env calls are in
            # flight — the flush's H2D + dispatch latency hides behind the
            # products compute instead of extending the sweep.  Ordering
            # is preserved where it matters: the flush still lands BEFORE
            # this sweep's pushes (replay parity is unchanged) and before
            # the NEXT sweep's action selection (the greedy policy is one
            # sweep staler than the eager flush — far fresher than the
            # reference's first-ready async PS, airfoil_dqn.py:331-336).
            if timing:
                _t1 = time.time()
            self._flush_optimize()
            if timing:
                tacc["opt"] += time.time() - _t1; _t0 += time.time() - _t1
            if prod_handle is not None:
                try:
                    outs = self._shared_transfer.run_products_batched_finish(
                        prod_handle
                    )
                    results = dict(zip(removal_idx, outs))
                except Exception:
                    infra_fail = True
            if infra_fail:
                # A device/link failure in the BATCHED pass says nothing
                # about any individual mesh: abort the removing envs' steps
                # entirely (prepare_step left their state untouched) rather
                # than recording num_parallel false broken-mesh terminals in
                # the replay ring.  Genuine numerical breakage is reported
                # per env through the `finite` flags, never as an exception.
                self.jsonlog.log(
                    "infra_abort",
                    envs=len(removal_idx),
                    global_step=self.state.global_step,
                )
                # Transient blips are absorbed (the aborted envs simply
                # retry next sweep); a PERSISTENT outage must crash so the
                # outer loop restarts the process with a fresh device
                # client — aborted sweeps advance no counters, so without
                # this the spin would also keep the jsonl fresh enough to
                # fool the stall watchdog.
                self._infra_fail_streak += 1
                if self._infra_fail_streak >= 5:
                    raise RuntimeError(
                        "batched env device pass failed "
                        f"{self._infra_fail_streak} sweeps in a row; "
                        "restart the process (run_train_loop.sh resumes "
                        "losslessly from the latest checkpoint)"
                    )
            elif removal_idx:
                self._infra_fail_streak = 0
            if timing:
                tacc["dev"] += time.time() - _t0; _t0 = time.time()
            if gather_handle is not None:
                feats = self._shared_transfer.gather_window_batched_finish(
                    gather_handle
                )
                for i, (vel_w, p_w) in zip(gather_idx, feats):
                    self.envs[i]._cached_state_inputs = (
                        preps[i].post_window,
                        vel_w,
                        p_w,
                    )
            if timing:
                tacc["gather"] += time.time() - _t0; _t0 = time.time()

            for i, env in enumerate(self.envs):
                if infra_fail and preps[i].inputs is not None:
                    continue  # aborted removal: the step never happened
                eps_val = eps_sweep[i]
                action = actions[i]
                nxt, rew, done, info = env.complete_step(preps[i], results.get(i))
                self.replay.push(
                    env_states[i], action, None if done else nxt, rew
                )
                env_states[i] = nxt
                ep_rewards[i].append(rew)
                ep_actions[i].append(action)
                self.metrics.add_eps(eps_val)
                self.state.global_step += 1

                if timing:
                    tacc["complete"] += time.time() - _t0; _t0 = time.time()
                self._optimize()
                if timing:
                    tacc["opt"] += time.time() - _t0; _t0 = time.time()

                if done:
                    self.metrics.add_episode(ep_rewards[i], ep_actions[i])
                    self.jsonlog.log(
                        "episode",
                        episode=self.state.episode + 1,
                        env=i,
                        steps=len(ep_rewards[i]),
                        reward=float(np.sum(ep_rewards[i])),
                        eps=eps_val,
                        global_step=self.state.global_step,
                    )
                    ep_rewards[i], ep_actions[i] = [], []
                    env_states[i] = env.reset()
                    self.state.episode += 1
                    # Artifact cadence: the reference writes + checkpoints
                    # every episode (airfoil_dqn.py:500-503), which is O(n)
                    # per write and a full param readback per save — at
                    # training scale that dominates the step loop.  Batch
                    # both on an episode interval (plus once at exit).
                    if self.state.episode % self.plot_every == 0:
                        self.metrics.plot()
                    if self.state.episode % self.write_every == 0:
                        self._flush_optimize()
                        self.metrics.write()
                    if self.state.episode % self.checkpoint_every == 0:
                        self._flush_optimize()
                        self._save_checkpoint()
                    if (
                        self.probe_every
                        and self.state.episode % self.probe_every == 0
                    ):
                        self._flush_optimize()
                        self._deploy_probe()
                    if self.state.episode >= num_episodes:
                        break
                if max_steps is not None and self.state.global_step >= max_steps:
                    self._flush_optimize()
                    self.metrics.write()
                    self._save_checkpoint()
                    if timing:
                        print(
                            {k: round(v, 2) for k, v in tacc.items()},
                            flush=True,
                        )
                    return self.summary(t_start)
            else:
                # NOTE: no flush here — the sweep's queued gradient batches
                # are dispatched at the top of the NEXT sweep, overlapped
                # with its batched env calls (see deferred flush above).
                if timing:
                    tacc["done"] += time.time() - _t0
                    tacc["sweeps"] += 1
                    if tacc["sweeps"] % 10 == 0:
                        print({k: round(v, 2) for k, v in tacc.items()}, flush=True)
                self._maybe_recycle()
                continue
            break
        self._flush_optimize()
        self.metrics.write()
        self._save_checkpoint()
        self.replay.save(self._replay_path)
        return self.summary(t_start)

    def _maybe_recycle(self):
        """Exit(75) for a lossless watchdog restart once the axon H2D
        retention (docs/AXON.md) has grown RSS past the watermark; exit(0)
        losslessly when a STOP file appears in the run dir (lets an
        operator end a run without losing the replay ring to a kill);
        exit(76) on a PAUSE file — same lossless save, but the run loop
        holds the relaunch until the PAUSED ack is removed (bench.py uses
        this to borrow the chip without terminating training)."""
        stop = os.path.exists(os.path.join(self.save_dir, "STOP"))
        pause = not stop and os.path.exists(os.path.join(self.save_dir, "PAUSE"))
        rss_kb = 0
        if not (stop or pause):
            try:
                rss_kb = int(
                    open("/proc/self/status").read().split("VmRSS:")[1].split()[0]
                )
            except Exception:
                return
            if rss_kb < self._rss_limit_kb:
                return
        self._flush_optimize()
        self.metrics.write()
        self.replay.save(self._replay_path)
        self._last_saved_episode = -1  # force a fresh checkpoint
        self._save_checkpoint()
        self.jsonlog.log(
            "stop" if stop else ("pause" if pause else "recycle"),
            rss_gb=round(rss_kb / 1024 / 1024, 1),
            episode=self.state.episode, global_step=self.state.global_step,
        )
        import sys

        if stop:
            try:
                os.remove(os.path.join(self.save_dir, "STOP"))
            except OSError:
                pass
        if pause:
            # Ack protocol: PAUSE -> PAUSED.  The pauser removes PAUSED to
            # release the run loop; a crashed pauser leaves PAUSED behind,
            # which an operator clears by hand (the loop logs the wait).
            try:
                os.replace(
                    os.path.join(self.save_dir, "PAUSE"),
                    os.path.join(self.save_dir, "PAUSED"),
                )
            except OSError:
                pass
        sys.stdout.flush(); sys.stderr.flush()
        os._exit(0 if stop else (76 if pause else 75))

    def _save_checkpoint(self):
        if self.state.episode == self._last_saved_episode:
            return
        self._last_saved_episode = self.state.episode
        rewards = self.metrics.rewards
        w = self.best_window
        ma = float(np.mean(rewards[-w:])) if len(rewards) >= w else None
        new_best = ma is not None and ma > self._best_ma
        if new_best:
            self._best_ma = ma
        extras = {
            "global_step": self.state.global_step,
            "episode": self.state.episode,
            # Metric-array lengths at save time let resume truncate the
            # arrays back into exact alignment with the counters.
            "n_losses": len(self.metrics.losses) + len(self.metrics._pending),
            "best_ma": self._best_ma,
            "best_deploy_removals": self._best_deploy[0],
            "best_deploy_reward": self._best_deploy[1],
        }
        self.ckpt.save(self.state.episode, self.dqn, extras)
        # Best-policy snapshot on a new 1000-episode moving-average high.
        if new_best:
            self.ckpt_best.save(
                self.state.episode, self.dqn, dict(extras, best_ma1000=ma)
            )
            self.jsonlog.log(
                "best_checkpoint", episode=self.state.episode,
                ma1000=round(ma, 4),
            )

    def _deploy_probe(self, max_steps: int = 100):
        """Roll ONE eps=0 episode (greedy argmax, deploy_dqn.py:201-202
        semantics) on a dedicated probe env and snapshot the nets to
        ckpt_best_deploy/ when removals-within-threshold makes a new high.

        The probe env is deterministic (reset() always starts from the
        stock mesh), so this measures exactly what a greedy deployment
        would execute.  Do-nothing farming caps out at `max_steps` with a
        low removal count and never displaces a remover policy."""
        from ..rl import select_action

        if self._probe_env is None:
            self._probe_env = AirfoilEnv(
                self.config, ground_truth=self.gt,
                transfer=self._shared_transfer,
            )
        env = self._probe_env
        thr = 100.0 * self.config.agent.threshold
        gtd = float(np.asarray(self.gt.gt_drag)[-1])
        state = env.reset()
        env.calculate_reward()
        removals_ok, removals, removals_failed, total = 0, 0, 0, 0.0
        reason = "max_steps"
        for _ in range(max_steps):
            # A probe is up to `max_steps` serial single-env device calls
            # (~1 min contended); without this poll a PAUSE from bench.py
            # can sit unacked past its handshake timeout (observed r4).
            if os.path.exists(os.path.join(self.save_dir, "PAUSE")) or (
                os.path.exists(os.path.join(self.save_dir, "STOP"))
            ):
                self.jsonlog.log(
                    "deploy_probe", episode=self.state.episode,
                    removals=removals, removals_ok=removals_ok,
                    reward=round(total, 3), terminal="aborted_pause",
                    best=False,
                )
                return
            a = int(select_action(self.dqn.params1, state, topk=self.dqn_cfg.topk))
            state, rew, done, info = env.step(a)
            total += rew
            # Only count removals the env actually executed (info.removed ==
            # 0): on a FAILED removal env.new_drags is not refreshed
            # (deployer.py records NaN for the same reason), so the stale
            # within-threshold error from the last accepted step would
            # otherwise count failed attempts as verified removals and let a
            # repeatedly-invalid policy be crowned ckpt_best_deploy.
            if a < env.action_space_n and info.removed == 0:
                removals += 1
                err = 100.0 * abs(float(env.new_drags[-1]) - gtd) / abs(gtd)
                if err <= thr:
                    removals_ok += 1
            elif a < env.action_space_n:
                removals_failed += 1
            if done:
                reason = info.terminal_reason or "done"
                break
        score = (removals_ok, total)
        new_best = score > self._best_deploy
        self.jsonlog.log(
            "deploy_probe", episode=self.state.episode,
            removals=removals, removals_ok=removals_ok,
            removals_failed=removals_failed,
            reward=round(total, 3), terminal=reason, best=new_best,
        )
        if new_best:
            self._best_deploy = score
            self.ckpt_best_deploy.save(
                self.state.episode, self.dqn,
                {
                    "global_step": self.state.global_step,
                    "episode": self.state.episode,
                    "n_losses": len(self.metrics.losses)
                    + len(self.metrics._pending),
                    "best_ma": self._best_ma,
                    "best_deploy_removals": removals_ok,
                    "best_deploy_reward": total,
                    "probe_removals_total": removals,
                    "probe_terminal": reason,
                },
            )

    def summary(self, t_start: float) -> dict:
        return {
            "episodes": self.state.episode,
            "global_steps": self.state.global_step,
            "wall_s": time.time() - t_start,
            "mean_reward": float(np.mean(self.metrics.rewards))
            if self.metrics.rewards
            else float("nan"),
            "grad_steps": int(self.dqn.num_grads),
        }
