"""Multi-chip data-parallel DQN training over a jax.sharding.Mesh.

The reference's only multi-worker structure is an asynchronous Ray
parameter-server: 12 rollout actors push transitions, gradient workers race,
and the first-ready gradient wins (airfoil_dqn.py:326-336).  The TPU-native
mapping (SURVEY.md §2c, §5) is synchronous data parallelism over ICI:

* Q-net params + optimizer state replicated on every chip;
* the replay batch sharded along its leading axis over the 'dp' mesh axis;
* each chip differentiates the Huber loss on its shard;
* `lax.pmean` over 'dp' reduces gradients across ICI (XLA emits an
  all-reduce);
* the optax update is computed identically everywhere, keeping replicas
  bit-synchronized — no parameter server, no weight shipping.

Built with `shard_map` so the collective is explicit and auditable rather
than left to GSPMD inference.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..rl.dqn import DQNConfig, DQNState, dqn_loss, make_optimizer
from ..rl.replay import TransitionBatch


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_dp_train_step(mesh: Mesh, cfg: DQNConfig, axis: str = "dp"):
    """Returns a jitted (DQNState, TransitionBatch) -> (DQNState, loss) with
    the batch sharded over `axis` and everything else replicated."""
    opt = make_optimizer(cfg)

    def _device_step(state: DQNState, batch: TransitionBatch):
        # Runs per-device on the local batch shard.
        def step_net(online, target, opt_state):
            loss, grads = jax.value_and_grad(dqn_loss)(online, target, batch, cfg)
            # Cross-chip gradient reduction (the ONLY communication).
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            updates, opt_state = opt.update(grads, opt_state, online)
            online = optax.apply_updates(online, updates)
            return online, opt_state, loss

        def branch1(s):
            p1, o1, loss = step_net(s.params1, s.params2, s.opt1)
            return s._replace(params1=p1, opt1=o1), loss

        def branch2(s):
            p2, o2, loss = step_net(s.params2, s.params1, s.opt2)
            return s._replace(params2=p2, opt2=o2), loss

        state, loss = jax.lax.cond(state.select, branch1, branch2, state)
        num_grads = state.num_grads + 1
        select = jax.lax.cond(
            num_grads % cfg.target_update == 0,
            lambda s: jnp.logical_not(s),
            lambda s: s,
            state.select,
        )
        return state._replace(num_grads=num_grads, select=select), loss

    batch_spec = jax.tree_util.tree_map(lambda _: P(axis), _batch_structure())
    state_spec = P()  # replicated

    sharded = shard_map(
        _device_step,
        mesh=mesh,
        in_specs=(state_spec, batch_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(sharded)


def _batch_structure():
    """A TransitionBatch-shaped pytree (used only for building PartitionSpecs)."""
    from ..env.graph import GraphState

    g = GraphState(x=0, edge_index=0, edge_attr=0, node_mask=0, edge_mask=0)
    return TransitionBatch(state=g, action=0, next_state=g, reward=0, non_final=0)


def shard_batch(mesh: Mesh, batch: TransitionBatch, axis: str = "dp") -> TransitionBatch:
    """Place a host batch with its leading dim sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
