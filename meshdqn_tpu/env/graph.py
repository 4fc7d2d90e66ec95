"""Padded graph observations over the mesh.

Replaces the reference's torch_geometric `Data` construction
(Env2DAirfoil.py:244-290) with a static-shape NamedTuple that jits/vmaps
cleanly: node budget = N_closest (180), edge budget = config.edge_budget.

Node features: [x, y, u_x^(s), u_y^(s) for each snapshot s, p^(s) for each s]
— the reference intends exactly this layout but garbles the velocity block
with a wrong-axis reshape (Env2DAirfoil.py:287 reshapes (S, N, 2) row-major
into (N, 2S)); we implement the intended layout (SURVEY.md §2a known
defects — not replicated).

Edges: for every mesh cell whose 3 vertices are all inside the observation
window, the 3 directed pairs (id1,id2), (id1,id3), (id2,id3) in cell-vertex
order, duplicates included — faithful to Env2DAirfoil.py:261-280, where
adjacent cells contribute the same undirected edge twice.
edge_attr = Euclidean lengths (carried for parity; the Q-net ignores it,
airfoilgcnn.py:94-128).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class GraphState(NamedTuple):
    x: jnp.ndarray  # (N, F) f32
    edge_index: jnp.ndarray  # (2, E) i32, padded with 0
    edge_attr: jnp.ndarray  # (E,) f32
    node_mask: jnp.ndarray  # (N,) bool
    edge_mask: jnp.ndarray  # (E,) bool


def build_graph_state(
    coords: np.ndarray,  # (V, 2) current mesh coords
    cells: np.ndarray,  # (C, 3)
    window: np.ndarray,  # (k,) vertex ids in the observation window (k <= N)
    vel_w: np.ndarray,  # (S, k, 2) velocities AT the window vertices
    p_w: np.ndarray,  # (S, k) pressures AT the window vertices
    n_nodes: int,
    edge_budget: int,
) -> GraphState:
    S = vel_w.shape[0]
    feat = 2 + 3 * S
    k = len(window)

    x = np.zeros((n_nodes, feat), dtype=np.float32)
    if k:
        x[:k, 0:2] = coords[window]
        # (S, k, 2) -> (k, 2S) with per-node [u_x^0, u_y^0, u_x^1, ...]
        x[:k, 2 : 2 + 2 * S] = np.transpose(vel_w, (1, 0, 2)).reshape(k, 2 * S)
        x[:k, 2 + 2 * S :] = np.asarray(p_w).T

    # window membership lookup
    inv = np.full(len(coords), -1, dtype=np.int64)
    inv[window] = np.arange(k)
    in_win = inv[cells]  # (C,3)
    good = (in_win >= 0).all(axis=1)
    tri = in_win[good]  # (n_good, 3) window-local ids

    pairs = np.concatenate(
        [tri[:, [0, 1]], tri[:, [0, 2]], tri[:, [1, 2]]], axis=0
    )  # matches the append order per cell, flattened cell-major per pair type;
    # ordering within the edge list is irrelevant to the conv layers.
    pts = coords[window] if k else np.zeros((0, 2))
    lengths = (
        np.linalg.norm(pts[pairs[:, 0]] - pts[pairs[:, 1]], axis=1)
        if len(pairs)
        else np.zeros((0,))
    )

    ne = min(len(pairs), edge_budget)
    if len(pairs) > edge_budget:
        import warnings

        warnings.warn(
            f"observation graph truncated: {len(pairs)} edges > edge_budget "
            f"{edge_budget}; raise agent.edge_budget (needs ~6x N_closest)",
            stacklevel=2,
        )
    edge_index = np.zeros((2, edge_budget), dtype=np.int32)
    edge_attr = np.zeros(edge_budget, dtype=np.float32)
    if ne:
        edge_index[:, :ne] = pairs[:ne].T
        edge_attr[:ne] = lengths[:ne]

    node_mask = np.zeros(n_nodes, dtype=bool)
    node_mask[:k] = True
    edge_mask = np.zeros(edge_budget, dtype=bool)
    edge_mask[:ne] = True

    # Host arrays on purpose: observations are pushed into the (host) replay
    # ring and stacked for batched device calls; returning device arrays here
    # would force a tunnel readback per replay push (measured 140 ms/step on
    # the remote-TPU link).  H2D transfer happens asynchronously at the
    # batched action-selection / train-step calls instead.
    return GraphState(
        x=x,
        edge_index=edge_index,
        edge_attr=edge_attr,
        node_mask=node_mask,
        edge_mask=edge_mask,
    )


def polyline_distance(points: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Distance from each point to a closed polyline (the airfoil ring).

    NumPy equivalent of shapely `Polygon.distance(Point)` for exterior
    points (Env2DAirfoil.py:239-241): min over ring segments of the
    point-to-segment distance.  Vectorised (P, K) — no GEOS.

    Uses the native C++ kernel when available (same formula, ~25x faster —
    this runs for every mesh vertex on every removal's window rebuild);
    falls back to the NumPy broadcast otherwise.
    """
    from ..native import available, polyline_distance_native

    if available():
        return polyline_distance_native(
            np.asarray(points, np.float64), np.asarray(ring, np.float64)
        )
    a = ring
    b = np.roll(ring, -1, axis=0)  # closing segment included
    ab = b - a  # (K,2)
    ab2 = np.maximum((ab * ab).sum(axis=1), 1e-300)
    ap = points[:, None, :] - a[None, :, :]  # (P,K,2)
    t = np.clip((ap * ab[None]).sum(axis=2) / ab2[None], 0.0, 1.0)
    proj = a[None] + t[..., None] * ab[None]
    d = np.linalg.norm(points[:, None, :] - proj, axis=2)
    return d.min(axis=1)
