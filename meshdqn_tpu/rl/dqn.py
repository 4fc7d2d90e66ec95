"""Double-DQN learner with alternating online/target roles.

Semantics from the reference (airfoil_dqn.py:151-310): TWO NodeRemovalNets;
every TARGET_UPDATE gradient applications the online/target roles swap
(airfoil_dqn.py:185-186); the online net's Q(s, a) regresses onto
r + gamma * max_a' Q_target(s', a') with Huber loss; Adam(lr, weight_decay)
with a MultiStepLR schedule (milestones 0.5M/1M/1.5M, gamma 0.1,
airfoil_dqn.py:172-176); greedy actions always come from net 1
(airfoil_dqn.py:208-209).

Reference defects fixed here (SURVEY.md §2a):
* the optimizer there is re-created on every apply (airfoil_dqn.py:195-199),
  destroying Adam moments — we keep one persistent optax state per net;
* at swap boundaries the reference applies gradients computed on one net to
  the other (toggle happens before installation, :184-194) — we apply to the
  net they came from, then swap;
* `get_weights`/`set_gradients` are not even defined on the reference model
  (it cannot run unpatched) — moot in a functional design.

The single jitted `train_step` replaces the entire Ray
ParameterServer/DataWorker RPC round-trip (airfoil_dqn.py:315-340): under
data-parallel sharding the same function runs SPMD with XLA inserting the
gradient psum (see parallel/).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..env.graph import GraphState
from ..models.noderemoval import forward
from .replay import TransitionBatch


@dataclass(frozen=True)
class DQNConfig:
    lr: float = 1e-5
    weight_decay: float = 1e-6
    gamma: float = 1.0
    target_update: int = 50
    topk: float = 0.1
    huber_delta: float = 1.0
    milestones: tuple = (500_000, 1_000_000, 1_500_000)
    milestone_gamma: float = 0.1
    # 'softmax' = reference head quirk (airfoilgcnn.py:143); 'linear' = raw
    # Q-logits — the stable training default (see models/noderemoval.forward).
    head: str = "softmax"
    # Global-norm gradient clipping before the optimizer; 0 disables (the
    # reference has none — round-2 value divergence motivated adding it).
    grad_clip: float = 0.0
    # 'swap' = the reference's alternating-role scheme (airfoil_dqn.py:185):
    # both nets learn, roles exchange every target_update grads.  Measured on
    # TPU this has NO stationary anchor — the two nets co-inflate through the
    # max-operator bias (round-3 ys930 @136k grads: mean Q 1.2e5 against true
    # returns <= ~22, greedy collapsed onto one action) — so training configs
    # use 'copy': net1 is always online and net2 is a frozen snapshot
    # hard-copied from net1 every target_update grads (canonical DQN anchor).
    target_mode: str = "swap"
    # True decouples action selection from evaluation in the bootstrap
    # (van Hasselt double-DQN): a* = argmax Q_online(s'), v = Q_target(s',a*).
    # False = the reference's plain max over the other net.
    double: bool = False
    # Clamp the Bellman target to [-c, +c]; 0 disables.  Episode returns are
    # bounded (|r| <= ~22 measured over 27k episodes, episodes <= ~45 steps),
    # so a generous c is non-binding at the optimum yet makes value runaway
    # mathematically impossible.
    target_clip: float = 0.0
    # Conservative-Q (CQL-style) regularizer weight; 0 disables.  With 181
    # actions and ~9-step episodes most (s, a) pairs are NEVER in the replay,
    # so generalization assigns them arbitrary values, the bootstrap max
    # picks the largest, and Q inflates without bound (measured: Q mean
    # drifts +0 -> +32 in 6k offline grad steps at every target cadence).
    # alpha * E[logsumexp_a Q(s,a) - Q(s,a_data)] pushes unseen actions'
    # values DOWN exactly as hard as generalization pushes them up
    # (Kumar et al. 2020), pinning the value scale to the observed returns.
    cql_alpha: float = 0.0


class DQNState(NamedTuple):
    params1: dict
    params2: dict
    opt1: optax.OptState
    opt2: optax.OptState
    num_grads: jnp.ndarray  # () int32
    select: jnp.ndarray  # () bool: True -> net1 is online


def make_optimizer(cfg: DQNConfig) -> optax.GradientTransformation:
    # torch Adam(weight_decay=wd) == L2 term folded into the gradient BEFORE
    # the Adam moments — optax.add_decayed_weights placed before adam.
    #
    # The milestones are specified in GLOBAL gradient applications
    # (airfoil_dqn.py:172-176).  Under 'swap' each net carries its own
    # optimizer whose internal count only advances while that net is online;
    # the strict role alternation every target_update splits global steps
    # evenly, so per-net boundaries sit at half the global milestones.
    # Under 'copy' net1's optimizer sees EVERY global step — no halving.
    div = 2 if cfg.target_mode == "swap" else 1
    schedule = optax.piecewise_constant_schedule(
        init_value=cfg.lr,
        boundaries_and_scales={
            int(m) // div: cfg.milestone_gamma for m in cfg.milestones
        },
    )
    steps = []
    if cfg.grad_clip > 0:
        # torch-style clip_grad_norm_: clip raw gradients before the L2
        # term and the Adam moments see them.
        steps.append(optax.clip_by_global_norm(cfg.grad_clip))
    steps += [
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.chain(*steps)


def init_dqn(params1: dict, params2: dict, cfg: DQNConfig) -> DQNState:
    opt = make_optimizer(cfg)
    if cfg.target_mode == "copy":
        # Standard DQN: the target starts as an exact snapshot of the online
        # net (the independent params2 init is only meaningful under 'swap').
        params2 = jax.tree.map(jnp.array, params1)
    return DQNState(
        params1=params1,
        params2=params2,
        opt1=opt.init(params1),
        opt2=opt.init(params2),
        num_grads=jnp.zeros((), jnp.int32),
        select=jnp.ones((), jnp.bool_),
    )


def _q_values(params, graphs: GraphState, topk: float, head: str = "softmax"):
    return jax.vmap(partial(forward, params, topk=topk, head=head))(graphs)  # (B, A)


def dqn_loss(online_params, target_params, batch: TransitionBatch, cfg: DQNConfig):
    q = _q_values(online_params, batch.state, cfg.topk, cfg.head)  # (B, A)
    q_sa = jnp.take_along_axis(q, batch.action[:, None], axis=1)[:, 0]

    q_next = _q_values(target_params, batch.next_state, cfg.topk, cfg.head)
    if cfg.double:
        # van Hasselt double-DQN: the ONLINE net picks a*, the target net
        # evaluates it — decoupling kills most of the max-operator
        # overestimation bias of the plain max (reference behaviour below).
        q_next_online = _q_values(
            online_params, batch.next_state, cfg.topk, cfg.head
        )
        a_star = jnp.argmax(q_next_online, axis=1)
        v_next = jnp.take_along_axis(q_next, a_star[:, None], axis=1)[:, 0]
    else:
        v_next = jnp.max(q_next, axis=1)
    v_next = jnp.where(batch.non_final, v_next, 0.0)
    target = batch.reward + cfg.gamma * v_next
    if cfg.target_clip > 0:
        target = jnp.clip(target, -cfg.target_clip, cfg.target_clip)
    target = jax.lax.stop_gradient(target)
    loss = jnp.mean(optax.huber_loss(q_sa, target, delta=cfg.huber_delta))
    if cfg.cql_alpha > 0:
        lse = jax.scipy.special.logsumexp(q, axis=1)
        loss = loss + cfg.cql_alpha * jnp.mean(lse - q_sa)
    return loss


def _train_step_impl(state: DQNState, batch: TransitionBatch, cfg: DQNConfig):
    opt = make_optimizer(cfg)

    def step_net(online, target, opt_state):
        loss, grads = jax.value_and_grad(dqn_loss)(online, target, batch, cfg)
        updates, opt_state = opt.update(grads, opt_state, online)
        online = optax.apply_updates(online, updates)
        return online, opt_state, loss

    if cfg.target_mode == "copy":
        # Anchored DQN: net1 always online, net2 a frozen snapshot refreshed
        # by hard copy every target_update gradient applications.
        p1, o1, loss = step_net(state.params1, state.params2, state.opt1)
        num_grads = state.num_grads + 1
        do_copy = num_grads % cfg.target_update == 0
        p2 = jax.tree.map(
            lambda a, b: jnp.where(do_copy, a, b), p1, state.params2
        )
        return (
            state._replace(params1=p1, params2=p2, opt1=o1, num_grads=num_grads),
            loss,
        )

    def branch_net1(s: DQNState):
        p1, o1, loss = step_net(s.params1, s.params2, s.opt1)
        return s._replace(params1=p1, opt1=o1), loss

    def branch_net2(s: DQNState):
        p2, o2, loss = step_net(s.params2, s.params1, s.opt2)
        return s._replace(params2=p2, opt2=o2), loss

    state, loss = jax.lax.cond(state.select, branch_net1, branch_net2, state)
    num_grads = state.num_grads + 1
    select = jax.lax.cond(
        num_grads % cfg.target_update == 0,
        lambda s: jnp.logical_not(s),
        lambda s: s,
        state.select,
    )
    return state._replace(num_grads=num_grads, select=select), loss


@partial(jax.jit, static_argnames=("cfg",))
def train_step(state: DQNState, batch: TransitionBatch, cfg: DQNConfig):
    """One gradient application; returns (new_state, loss)."""
    return _train_step_impl(state, batch, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def train_step_many(state: DQNState, batches: TransitionBatch, cfg: DQNConfig):
    """K sequential gradient applications as ONE device call.

    `batches` leaves carry a leading K axis; a lax.scan over them is
    arithmetically identical to K successive `train_step` calls (same
    per-step cond/swap logic), but costs one host round-trip instead of K —
    the trainer uses this to collapse the per-transition optimize calls of a
    parallel-env sweep (reference: one DataWorker RPC per transition,
    airfoil_dqn.py:315-340) into a single tunnel round-trip.
    Returns (new_state, losses (K,)).
    """

    def body(s, b):
        return _train_step_impl(s, b, cfg)

    return jax.lax.scan(body, state, batches)


@partial(jax.jit, static_argnames=("cfg",))
def train_step_idx(state: DQNState, store, idx, cfg: DQNConfig):
    """One gradient application whose batch is GATHERED ON DEVICE from a
    DeviceReplay store by (B,) indices — only the indices cross the host
    link (rl/replay.py DeviceReplay)."""
    from .replay import gather_batch

    return _train_step_impl(state, gather_batch(store, idx), cfg)


@partial(jax.jit, static_argnames=("cfg",))
def train_step_many_idx(state: DQNState, store, idx, cfg: DQNConfig):
    """K sequential gradient applications, batches gathered on device from
    a DeviceReplay store by (K, B) indices.  Arithmetically identical to
    train_step_many over host-sampled batches of the same indices, but the
    K*B padded-graph tensors never leave device memory — the sweep's
    optimize flush uploads ~5 KB of indices instead of ~40 MB of batches.
    Returns (new_state, losses (K,))."""
    from .replay import gather_batch

    def body(s, i):
        return _train_step_impl(s, gather_batch(store, i), cfg)

    return jax.lax.scan(body, state, idx)


@partial(jax.jit, static_argnames=("topk",))
def select_action(params1: dict, g: GraphState, topk: float = 0.1):
    """Greedy action from net 1 (airfoil_dqn.py:208-209)."""
    return jnp.argmax(forward(params1, g, topk=topk))


@partial(jax.jit, static_argnames=("topk",))
def select_actions_batched(params1: dict, graphs: GraphState, topk: float = 0.1):
    """Greedy actions for a stacked batch of graphs -> (B,) int.

    One device round-trip for all parallel environments (the reference pays
    one ParameterServer RPC per env step, airfoil_dqn.py:461)."""
    q = jax.vmap(partial(forward, params1, topk=topk))(graphs)
    return jnp.argmax(q, axis=1)


def epsilon(steps_done: float, start: float, end: float, decay: float) -> float:
    """eps = end + (start-end) exp(-steps/decay) (airfoil_dqn.py:455)."""
    import math

    return end + (start - end) * math.exp(-steps_done / decay)
