"""NodeRemovalNet — the double-DQN Q-network over mesh graphs.

Architecture replicated from the reference (airfoilgcnn.py:24-145), active
blocks only (conv3/conv6 are dead code there, :106-110, :124-128):

    SAGE(F->w) -> ReLU -> TopK(r) -> [gmp || gap] -> x1
    SAGE(w->w) -> ReLU -> TopK(r) -> [gmp || gap] -> x2
    GCN(w->w)  -> ReLU -> TopK(r) -> [gmp || gap] -> x4
    GCN(w->w)  -> ReLU -> TopK(r) -> [gmp || gap] -> x5
    x = x1+x2+x4+x5 -> Linear(2w,128) -> ReLU -> Linear(128,64) -> ReLU
      -> Linear(64, A) -> softmax

(yes, softmax over Q-values — a reference quirk kept for parity,
airfoilgcnn.py:143).  Training config uses w=128, r=0.1, A=N_closest+1
(airfoil_dqn.py:156).

The pooling cascade runs on static padded sizes: with N input nodes the
stage budgets are ceil(r*N), ceil(r*ceil(r*N)), ... while the *dynamic*
valid count follows PyG's ceil(ratio * n_valid) per graph.

`init_params(key, ...)` plays the role of reset() + set_num_nodes()
(airfoilgcnn.py:50-80): all weights xavier-normal gain 0.9, biases standard
normal (GCN biases zero), including the input conv (the reference replaces
conv1 after seeding with PyG defaults; we use the same scheme as the rest —
training is not bit-replicable across frameworks anyway).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..env.graph import GraphState
from .layers import (
    gcn_conv,
    gcn_init,
    global_max_pool,
    global_mean_pool,
    linear,
    linear_init,
    sage_conv,
    sage_init,
    topk_init,
    topk_pool,
)


def stage_sizes(n_nodes: int, ratio: float, n_stages: int = 4) -> list[int]:
    sizes = []
    n = n_nodes
    for _ in range(n_stages):
        n = max(int(math.ceil(ratio * n)), 1)
        sizes.append(n)
    return sizes


def init_params(
    key,
    in_dim: int,
    output_dim: int,
    conv_width: int = 64,
    topk: float = 0.5,
):
    ks = jax.random.split(key, 12)
    w = conv_width
    return {
        "conv1": sage_init(ks[0], in_dim, w),
        "pool1": topk_init(ks[1], w),
        "conv2": sage_init(ks[2], w, w),
        "pool2": topk_init(ks[3], w),
        "conv4": gcn_init(ks[4], w, w),
        "pool4": topk_init(ks[5], w),
        "conv5": gcn_init(ks[6], w, w),
        "pool5": topk_init(ks[7], w),
        "lin1": linear_init(ks[8], 2 * w, 128),
        "lin2": linear_init(ks[9], 128, 64),
        "lin3": linear_init(ks[10], 64, output_dim),
    }


def forward(
    params,
    g: GraphState,
    topk: float = 0.5,
    embedding: bool = False,
    head: str = "softmax",
):
    """Single-graph forward pass -> (A,) action values.

    head='softmax' reproduces the reference quirk (softmax over Q-values,
    airfoilgcnn.py:143); head='linear' returns raw logits as Q-values — the
    standard DQN head.  Greedy argmax is identical under both (softmax is
    monotone), but the softmax head couples every action's regression target
    through the normalization (pushing one Q down pushes all others up),
    which round-2 training runs showed drives late-training value collapse;
    'linear' is the training default in the shipped configs.

    Batch with jax.vmap(partial(forward, params)).
    """
    x = g.x.astype(jnp.float32)
    ei, em, nm = g.edge_index, g.edge_mask, g.node_mask
    n0 = x.shape[0]
    k1, k2, k4, k5 = stage_sizes(n0, topk)

    def block(conv_fn, cparams, pparams, x, ei, em, nm, k_static):
        h = jax.nn.relu(conv_fn(cparams, x, ei, em, nm))
        pg = topk_pool(pparams, h, ei, em, nm, topk, k_static)
        read = jnp.concatenate(
            [global_max_pool(pg.x, pg.node_mask), global_mean_pool(pg.x, pg.node_mask)]
        )
        return pg, read

    pg, x1 = block(sage_conv, params["conv1"], params["pool1"], x, ei, em, nm, k1)
    pg, x2 = block(sage_conv, params["conv2"], params["pool2"], pg.x, pg.edge_index, pg.edge_mask, pg.node_mask, k2)
    pg, x4 = block(gcn_conv, params["conv4"], params["pool4"], pg.x, pg.edge_index, pg.edge_mask, pg.node_mask, k4)
    pg, x5 = block(gcn_conv, params["conv5"], params["pool5"], pg.x, pg.edge_index, pg.edge_mask, pg.node_mask, k5)

    h = x1 + x2 + x4 + x5  # (2w,)
    if embedding:
        return h
    h = jax.nn.relu(linear(params["lin1"], h))
    h = jax.nn.relu(linear(params["lin2"], h))
    h = linear(params["lin3"], h)
    if head == "softmax":
        return jax.nn.softmax(h, axis=-1)
    return h


def batched_forward(params, graphs: GraphState, topk: float = 0.5, head: str = "softmax"):
    """graphs: GraphState with a leading batch dim on every leaf -> (B, A)."""
    return jax.vmap(partial(forward, params, topk=topk, head=head))(graphs)


# ----------------------------------------------------------------------
# Legacy drag surrogate (reference airfoilgcnn.py:148-209): 6 conv blocks
# over the 2 velocity feature columns -> scalar drag regression.  Kept for
# capability parity with deploy_dqn.py's SURROGATE_MODEL path.
# ----------------------------------------------------------------------

def surrogate_init(key, conv_width: int = 64):
    ks = jax.random.split(key, 16)
    w = conv_width
    p = {}
    p["conv1"] = sage_init(ks[0], 2, w)
    p["pool1"] = topk_init(ks[1], w)
    p["conv2"] = sage_init(ks[2], w, w)
    p["pool2"] = topk_init(ks[3], w)
    p["conv3"] = sage_init(ks[4], w, w)
    p["pool3"] = topk_init(ks[5], w)
    p["conv4"] = gcn_init(ks[6], w, w)
    p["pool4"] = topk_init(ks[7], w)
    p["conv5"] = gcn_init(ks[8], w, w)
    p["pool5"] = topk_init(ks[9], w)
    p["conv6"] = gcn_init(ks[10], w, w)
    p["pool6"] = topk_init(ks[11], w)
    p["lin1"] = linear_init(ks[12], 2 * w, 128)
    p["lin2"] = linear_init(ks[13], 128, 64)
    p["lin3"] = linear_init(ks[14], 64, 1)
    return p


def surrogate_forward(params, g: GraphState, topk: float = 0.5):
    """AirfoilGCNN drag surrogate: uses feature columns [2, 3] (the first
    snapshot's velocity, airfoilgcnn.py:177)."""
    x = g.x.astype(jnp.float32)[:, 2:4]
    ei, em, nm = g.edge_index, g.edge_mask, g.node_mask
    sizes = stage_sizes(x.shape[0], topk, n_stages=6)

    reads = []
    convs = [
        (sage_conv, "conv1", "pool1"),
        (sage_conv, "conv2", "pool2"),
        (sage_conv, "conv3", "pool3"),
        (gcn_conv, "conv4", "pool4"),
        (gcn_conv, "conv5", "pool5"),
        (gcn_conv, "conv6", "pool6"),
    ]
    h, cei, cem, cnm = x, ei, em, nm
    for (fn, cname, pname), k_static in zip(convs, sizes):
        h = jax.nn.relu(fn(params[cname], h, cei, cem, cnm))
        pg = topk_pool(params[pname], h, cei, cem, cnm, topk, k_static)
        reads.append(
            jnp.concatenate(
                [global_max_pool(pg.x, pg.node_mask), global_mean_pool(pg.x, pg.node_mask)]
            )
        )
        h, cei, cem, cnm = pg.x, pg.edge_index, pg.edge_mask, pg.node_mask

    h = sum(reads)
    h = jax.nn.relu(linear(params["lin1"], h))
    h = jax.nn.relu(linear(params["lin2"], h))
    return linear(params["lin3"], h)[0]
