"""Graph layers on padded graphs: SAGEConv, GCNConv, TopKPooling, pools.

Functional JAX re-implementations of the torch_geometric layers the
reference composes (airfoilgcnn.py:5, 30-44), built for static shapes:
every graph carries a node mask and an edge mask instead of a dynamic node
count, so the whole network jits and vmaps over batches.

Semantics matched to PyG:
* SAGEConv:   out_i = W_l . mean_{j->i} x_j + b_l + W_r . x_i
              (lin_l has bias, lin_r does not)
* GCNConv:    self-loops added, symmetric deg^{-1/2} normalization, bias
              added post-aggregation (initialised to zero like PyG)
* TopKPooling: score_i = (x_i . w)/||w||; keep top ceil(ratio * n_valid)
              nodes; gate kept features by tanh(score); re-index surviving
              edges (PyG filter_adj)
* global max/mean pool over valid nodes

Duplicate edges (the env emits each interior mesh edge twice,
Env2DAirfoil.py:261-280) are handled identically to PyG: they weight a
neighbour twice in mean/sum aggregation.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------
# Initialisers (torch parity)
# ----------------------------------------------------------------------

def xavier_normal(key, shape, gain=0.9, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_: std = gain * sqrt(2/(fan_in+fan_out)).

    The reference applies gain=0.9 to every weight it re-initialises
    (airfoilgcnn.py:50-76)."""
    fan_out, fan_in = shape[0], shape[1]
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def std_normal(key, shape, dtype=jnp.float32):
    """torch.nn.init.normal_ (mean 0, std 1) — used for biases
    (airfoilgcnn.py:53 etc.)."""
    return jax.random.normal(key, shape, dtype)


# ----------------------------------------------------------------------
# SAGEConv
# ----------------------------------------------------------------------

# Message-passing backend.  'dense' lowers every gather/scatter to one-hot
# matmuls on the MXU — for the padded 180-node observation graphs this is
# fast AND avoids XLA gather/scatter compilation entirely (the remote TPU
# compile service here has shown multi-minute first-gather compiles).
# 'segment' uses gathers + jax.ops.segment_sum (the usual formulation,
# better for very large graphs).
AGGREGATION = "dense"


def _onehot(ids, mask, n_nodes, dtype):
    """(K, N) one-hot rows selecting node ids (masked rows are zero)."""
    r = jnp.arange(n_nodes, dtype=ids.dtype)
    return ((ids[:, None] == r[None, :]) & mask[:, None]).astype(dtype)


def _edge_matrices(edge_index, edge_mask, n_nodes, dtype):
    """src_oh (E, N) and dst_oh^T (N, E) for dense message passing."""
    src_oh = _onehot(edge_index[0], edge_mask, n_nodes, dtype)
    dst_ohT = _onehot(edge_index[1], edge_mask, n_nodes, dtype).T
    return src_oh, dst_ohT


def sage_init(key, in_dim, out_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lin_l_w": xavier_normal(k1, (out_dim, in_dim)),
        "lin_l_b": std_normal(k2, (out_dim,)),
        "lin_r_w": xavier_normal(k3, (out_dim, in_dim)),
    }


def sage_conv(params, x, edge_index, edge_mask, node_mask):
    """x: (N,F); edge_index: (2,E) src->dst; masks bool."""
    N = x.shape[0]
    if AGGREGATION == "dense":
        src_oh, dst_ohT = _edge_matrices(edge_index, edge_mask, N, x.dtype)
        # Adjacency with edge multiplicity: A[i, j] = #edges j->i.
        adj = dst_ohT @ src_oh  # (N, N)
        summed = adj @ x
        count = adj.sum(axis=1)
    else:
        src, dst = edge_index[0], edge_index[1]
        w = edge_mask.astype(x.dtype)
        summed = jax.ops.segment_sum(x[src] * w[:, None], dst, num_segments=N)
        count = jax.ops.segment_sum(w, dst, num_segments=N)
    mean = summed / jnp.maximum(count, 1.0)[:, None]
    out = mean @ params["lin_l_w"].T + params["lin_l_b"] + x @ params["lin_r_w"].T
    return out * node_mask[:, None].astype(x.dtype)


# ----------------------------------------------------------------------
# GCNConv
# ----------------------------------------------------------------------

def gcn_init(key, in_dim, out_dim):
    return {
        "w": xavier_normal(key, (out_dim, in_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),  # PyG zeros init
    }


def gcn_conv(params, x, edge_index, edge_mask, node_mask):
    N = x.shape[0]
    nm = node_mask.astype(x.dtype)
    if AGGREGATION == "dense":
        src_oh, dst_ohT = _edge_matrices(edge_index, edge_mask, N, x.dtype)
        adj = dst_ohT @ src_oh  # (N, N), multiplicity-weighted
        deg = adj.sum(axis=1) + nm  # self-loops on valid nodes
        dinv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
        norm_adj = adj * dinv[:, None] * dinv[None, :]
        agg = norm_adj @ x
    else:
        src, dst = edge_index[0], edge_index[1]
        w = edge_mask.astype(x.dtype)
        deg = jax.ops.segment_sum(w, dst, num_segments=N) + nm
        dinv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
        norm = dinv[src] * dinv[dst] * w  # (E,)
        agg = jax.ops.segment_sum(x[src] * norm[:, None], dst, num_segments=N)
    agg = agg + x * (dinv * dinv * nm)[:, None]  # self-loop term
    out = agg @ params["w"].T + params["b"]
    return out * nm[:, None]


# ----------------------------------------------------------------------
# TopKPooling
# ----------------------------------------------------------------------

def topk_init(key, in_dim):
    # PyG initialises the score vector uniformly (glorot-ish); the reference
    # never re-initialises pool weights, so PyG's default stands.  We use
    # xavier-normal over a (1, in_dim) shape for a comparable scale.
    return {"w": xavier_normal(key, (1, in_dim), gain=1.0)[0]}


class PooledGraph(NamedTuple):
    x: jnp.ndarray
    edge_index: jnp.ndarray
    edge_mask: jnp.ndarray
    node_mask: jnp.ndarray


def topk_pool(params, x, edge_index, edge_mask, node_mask, ratio: float, k_static: int):
    """Select top ceil(ratio * n_valid) of the valid nodes.

    Returns a graph padded to k_static nodes (static shape).
    """
    w = params["w"]
    score = (x @ w) / jnp.maximum(jnp.linalg.norm(w), 1e-12)  # (N,)
    score = jnp.where(node_mask, score, -jnp.inf)

    n_valid = jnp.sum(node_mask.astype(jnp.int32))
    k_dyn = jnp.ceil(ratio * n_valid).astype(jnp.int32)
    k_dyn = jnp.minimum(jnp.maximum(k_dyn, 0), k_static)

    top_scores, top_idx = jax.lax.top_k(score, k_static)  # (k_static,)
    new_mask = jnp.arange(k_static) < k_dyn
    gate = jnp.where(new_mask, jnp.tanh(top_scores), 0.0)
    if AGGREGATION == "dense":
        sel_oh = _onehot(top_idx.astype(jnp.int32), new_mask, x.shape[0], x.dtype)
        new_x = (sel_oh @ x) * gate[:, None]
    else:
        new_x = x[top_idx] * gate[:, None]

    # Re-index edges: old node -> new slot (or -1).  Dense matching instead
    # of a scatter (see AGGREGATION note above): (E, k) comparison table.
    def remap(old_ids):
        hit = (old_ids[:, None] == top_idx[None, :]) & new_mask[None, :]  # (E,k)
        found = hit.any(axis=1)
        slot = jnp.argmax(hit, axis=1).astype(jnp.int32)
        return jnp.where(found, slot, -1)

    src_new = remap(edge_index[0])
    dst_new = remap(edge_index[1])
    keep = (src_new >= 0) & (dst_new >= 0) & edge_mask
    new_edges = jnp.stack(
        [jnp.where(keep, src_new, 0), jnp.where(keep, dst_new, 0)]
    )
    return PooledGraph(new_x, new_edges, keep, new_mask)


# ----------------------------------------------------------------------
# Global pools
# ----------------------------------------------------------------------

def global_max_pool(x, node_mask):
    masked = jnp.where(node_mask[:, None], x, -jnp.inf)
    out = jnp.max(masked, axis=0)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def global_mean_pool(x, node_mask):
    w = node_mask.astype(x.dtype)
    return (x * w[:, None]).sum(axis=0) / jnp.maximum(w.sum(), 1.0)


# ----------------------------------------------------------------------
# Linear
# ----------------------------------------------------------------------

def linear_init(key, in_dim, out_dim, bias_normal=True):
    k1, k2 = jax.random.split(key)
    return {
        "w": xavier_normal(k1, (out_dim, in_dim)),
        "b": std_normal(k2, (out_dim,)) if bias_normal else jnp.zeros((out_dim,)),
    }


def linear(params, x):
    return x @ params["w"].T + params["b"]
