"""Typed configuration with YAML loading and CLI overrides.

The reference splits configuration between a YAML tree
(configs/ray_ys930.yaml) and hand-edited module constants (RESTART,
PREFIX at airfoil_dqn.py:343-346, deploy flags deploy_dqn.py:58-69).
Here everything lives in one typed tree; the reference YAML schema loads
unchanged (same keys), and every field can be overridden on the command line
as `section.key=value`.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class FlowConfig:
    mu: float = 1e-3
    rho: float = 1.0
    inflow: str = "constant"
    mesh: str = ""
    dt: float = 1e-3
    solver_type: str = "lu"  # kept for schema parity; device solver ignores it
    smooth: bool = True
    # TPU-native additions
    precision: str = "f64"  # 'f64' | 'f32' | 'df32' | 'mixed'
    refine_iters: int = 2
    # Shape-quantized fused-operator padding (solver/ipcs.py pad_quantum):
    # collapses per-mesh-shape compiles onto shared cache buckets.  Used by
    # the deploy re-simulation path and resolution sweeps; 0 = off.
    pad_quantum: int = 0
    # Vertex-removal re-triangulation: 'global' = reference-parity global
    # Delaunay (Env2DAirfoil.py:487-493); 'cavity' = O(star) local
    # constrained-Delaunay cavity fill (coarsen/cavity.py) which perturbs
    # nothing outside the removed vertex's star.
    retriangulation: str = "global"


@dataclass
class AgentConfig:
    solver_steps: int = 5000
    episodes: int = 1_000_000
    timesteps: int = 10_000
    threshold: float = 1e-3
    N_closest: int = 180
    gt_drag: Any = -1
    gt_time: Any = -1
    u: Any = -1
    p: Any = -1
    do_nothing: bool = True
    time_reward: float = 0.005
    smoothing: bool = True
    save_steps: int = 1000
    goal_vertices: float = 0.95
    plot_dir: str = ""
    target_update: int = 50
    num_workers: int = 1
    num_parallel: int = 12
    # TPU-native additions
    # Reference quirk (Env2DAirfoil.py:349): on threshold termination the
    # code assigns -0.5 to a dead attribute `self.rew` and still returns the
    # drag+time reward.  False reproduces that behaviour; True applies the
    # intended -0.5 terminal reward.
    terminal_penalty: bool = False
    edge_budget: int = 1152  # padded directed-edge capacity of state graphs
    # Artifact cadence in episodes (the reference writes metrics + a full
    # checkpoint EVERY episode, airfoil_dqn.py:500-503 — O(n) writes and a
    # whole-params readback per save, which dominates at training scale).
    write_every: int = 25
    checkpoint_every: int = 25
    # Q-network output head: 'softmax' = reference quirk (airfoilgcnn.py:143),
    # 'linear' = standard raw-Q head (stable; see models/noderemoval.forward).
    head: str = "softmax"
    # Target-network scheme: 'swap' = the reference's alternating roles
    # (airfoil_dqn.py:185, no stationary anchor — measured value runaway,
    # rl/dqn.py DQNConfig); 'copy' = canonical frozen-snapshot target.
    target_mode: str = "swap"
    # van Hasselt double-DQN bootstrap (select with online, evaluate with
    # target).  False = the reference's plain max over the other net.
    double: bool = False
    # Replay ring capacity (reference hard-codes 10000, airfoil_dqn.py:412).
    # With 32 parallel envs and ~6-step episodes a 10k ring turns over in
    # ~3 minutes of wall clock — once the greedy policy goes deterministic
    # the ring floods with a single trajectory and CQL then crushes every
    # absent action (the round-3 ys930 death spiral).  A larger ring keeps
    # older, diverse experience alive on the policy-change timescale.
    replay_capacity: int = 10_000
    # Deploy-probe cadence in episodes (0 = off).  Training reward and
    # deployability are NOT the same objective under the reference's reward
    # (Env2DAirfoil.py:380-428): a policy that parks on do-nothing actions
    # at near-zero drag error farms +~1/step and posts the highest episode
    # rewards while greedily removing almost nothing — measured round 4 on
    # ys930, the MA1000 +13.2 high-water policy made 4 greedy removals while
    # a MA ~+5 checkpoint made 28.  Every probe_every episodes the trainer
    # rolls ONE eps=0 episode (deploy_dqn.py:201-202 semantics) and
    # snapshots the nets to ckpt_best_deploy/ whenever the count of
    # removals-within-threshold makes a new high — model selection by the
    # deliverable metric, not the training proxy.
    probe_every: int = 0


@dataclass
class OptimizerConfig:
    lr: float = 1e-5
    weight_decay: float = 1e-6
    batch_size: int = 32
    # Global-norm gradient clip applied before Adam; 0 = off (reference
    # parity).  Training configs enable it against value divergence.
    grad_clip: float = 0.0
    # Clamp the Bellman target to [-c, +c]; 0 = off (reference parity).
    # Episode returns are bounded (|r| <= ~22 measured), so a generous c is
    # non-binding at the optimum yet hard-bounds any value runaway.
    target_clip: float = 0.0
    # Conservative-Q regularizer weight (rl/dqn.py DQNConfig.cql_alpha);
    # 0 = off (reference parity).
    cql_alpha: float = 0.0


@dataclass
class EpsilonConfig:
    decay: float = 10_000.0
    start: float = 1.0
    end: float = 0.01
    gamma: float = 1.0


@dataclass
class Config:
    flow: FlowConfig = field(default_factory=FlowConfig)
    agent: AgentConfig = field(default_factory=AgentConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    epsilon: EpsilonConfig = field(default_factory=EpsilonConfig)
    seed: int = 1370  # airfoil_dqn.py:28
    save_dir: str = "training_results"
    prefix: str = "run_"

    # ------------------------------------------------------------------
    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path) as f:
            raw = yaml.safe_load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "Config":
        cfg = cls()
        # Reference schema: flow_config/{flow_params, geometry_params,
        # solver_params}, agent_params, optimizer, epsilon.
        fc = raw.get("flow_config", {})
        _fill(cfg.flow, fc.get("flow_params", {}))
        _fill(cfg.flow, fc.get("geometry_params", {}))
        _fill(cfg.flow, fc.get("solver_params", {}))
        _fill(cfg.flow, raw.get("flow", {}))
        _fill(cfg.agent, raw.get("agent_params", {}))
        _fill(cfg.agent, raw.get("agent", {}))
        _fill(cfg.optimizer, raw.get("optimizer", {}))
        _fill(cfg.epsilon, raw.get("epsilon", {}))
        for key in ("seed", "save_dir", "prefix"):
            if key in raw:
                setattr(cfg, key, raw[key])
        return cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f)

    def apply_overrides(self, overrides: list[str]) -> "Config":
        """Apply `section.key=value` strings (e.g. 'optimizer.lr=3e-4')."""
        for item in overrides:
            key, _, value = item.partition("=")
            parts = key.strip().split(".")
            obj = self
            for p in parts[:-1]:
                obj = getattr(obj, p)
            current = getattr(obj, parts[-1])
            setattr(obj, parts[-1], _coerce(value, current))
        return self


def _fill(obj, src: dict):
    for k, v in src.items():
        if hasattr(obj, k):
            current = getattr(obj, k)
            setattr(obj, k, _coerce(v, current))


def _coerce(value, current):
    if isinstance(value, str):
        if isinstance(current, bool):
            return value.lower() in ("1", "true", "yes")
        if isinstance(current, int) and not isinstance(current, bool):
            try:
                return int(value)
            except ValueError:
                return int(float(value))
        if isinstance(current, float):
            return float(value)
    if isinstance(current, float) and isinstance(value, (int, str)):
        return float(value)
    return value
