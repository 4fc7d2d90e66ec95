"""Drag-surrogate training: AirfoilGCNN regression on (graph, drag) pairs.

The reference ships the AirfoilGCNN drag surrogate (airfoilgcnn.py:148-209)
and a deploy-time flag that loads a pretrained one (deploy_dqn.py:19,
95-100); the training code itself is not in the repo.  This module provides
the missing piece: supervised regression of the scalar drag from mesh-graph
states, with the same optimizer family the reference uses for the Q-net.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..env.graph import GraphState
from .noderemoval import surrogate_forward, surrogate_init


def make_surrogate_trainer(lr: float = 1e-4, topk: float = 0.5):
    opt = optax.adam(lr)

    def loss_fn(params, graphs: GraphState, targets: jnp.ndarray):
        pred = jax.vmap(partial(surrogate_forward, params, topk=topk))(graphs)
        return jnp.mean((pred - targets) ** 2)

    @jax.jit
    def step(params, opt_state, graphs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, graphs, targets)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(key, conv_width: int = 64):
        params = surrogate_init(key, conv_width=conv_width)
        return params, opt.init(params)

    return init, step, loss_fn


def predict_drag(params, graph: GraphState, topk: float = 0.5) -> float:
    return float(surrogate_forward(params, graph, topk=topk))
