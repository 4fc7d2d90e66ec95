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


# ----------------------------------------------------------------------
# Checkpointing: one portable npz (leaves in tree order + metadata), the
# counterpart of the reference's pretrained_model.joblib
# (deploy_dqn.py:95-100).
# ----------------------------------------------------------------------

def save_surrogate(path: str, params, conv_width: int, topk: float = 0.5):
    import numpy as np

    leaves = jax.tree_util.tree_leaves(params)
    np.savez(
        path,
        *[np.asarray(leaf) for leaf in leaves],
        conv_width=np.asarray(conv_width),
        topk=np.asarray(topk),
    )


def load_surrogate(path: str):
    """Returns (params, topk).  The param tree is rebuilt from
    surrogate_init's deterministic structure at the stored conv_width."""
    import numpy as np

    z = np.load(path)
    conv_width = int(z["conv_width"])
    topk = float(z["topk"])
    template = surrogate_init(jax.random.PRNGKey(0), conv_width=conv_width)
    treedef = jax.tree_util.tree_structure(template)
    leaves = [jnp.asarray(z[f"arr_{i}"]) for i in range(treedef.num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves), topk


def train_surrogate(
    graphs: GraphState,
    targets,
    *,
    conv_width: int = 64,
    topk: float = 0.5,
    lr: float = 1e-4,
    epochs: int = 200,
    batch_size: int = 16,
    seed: int = 0,
    val_frac: float = 0.2,
    log_every: int = 0,
):
    """Mini-batch regression on stacked GraphState leaves (leading batch
    axis).  Returns (params, report) with train/val MSE and relative error.
    """
    import numpy as np

    n = len(targets)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = max(1, int(val_frac * n)) if n > 4 else 0
    val_idx, trn_idx = perm[:n_val], perm[n_val:]

    take = lambda g, idx: jax.tree_util.tree_map(lambda a: a[idx], g)
    targets = jnp.asarray(targets, jnp.float32)

    init, step, loss_fn = make_surrogate_trainer(lr=lr, topk=topk)
    params, opt_state = init(jax.random.PRNGKey(seed), conv_width=conv_width)
    for epoch in range(epochs):
        order = rng.permutation(len(trn_idx))
        for s in range(0, len(order), batch_size):
            idx = trn_idx[order[s : s + batch_size]]
            params, opt_state, loss = step(
                params, opt_state, take(graphs, idx), targets[idx]
            )
        if log_every and (epoch + 1) % log_every == 0:
            print(f"epoch {epoch + 1}: train mse {float(loss):.3e}", flush=True)

    def _eval(idx):
        if len(idx) == 0:
            return float("nan"), float("nan")
        pred = jax.vmap(lambda g: surrogate_forward(params, g, topk=topk))(
            take(graphs, idx)
        )
        t = targets[idx]
        mse = float(jnp.mean((pred - t) ** 2))
        rel = float(jnp.mean(jnp.abs(pred - t) / jnp.maximum(jnp.abs(t), 1e-12)))
        return mse, rel

    trn_mse, trn_rel = _eval(trn_idx)
    val_mse, val_rel = _eval(val_idx)
    report = {
        "n_train": int(len(trn_idx)),
        "n_val": int(len(val_idx)),
        "train_mse": trn_mse,
        "train_rel_err": trn_rel,
        "val_mse": val_mse,
        "val_rel_err": val_rel,
    }
    return params, report
