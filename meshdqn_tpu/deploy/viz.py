"""Mesh/state visualization.

Equivalents of the reference's plotting helpers: Env2DAirfoil.plot_state
(Env2DAirfoil.py:171-217), deploy_dqn.vertex_plot (:272-296) and plot_mesh
(:465-488).  Headless (Agg) matplotlib.
"""
from __future__ import annotations

import numpy as np

from ..mesh import TriMesh


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    return plt


def _draw_mesh(ax, mesh: TriMesh, color="#888888", lw=0.5):
    coords = mesh.coords
    segs = coords[mesh.edges]  # (E, 2, 2)
    from matplotlib.collections import LineCollection

    ax.add_collection(LineCollection(segs, colors=color, linewidths=lw, zorder=0))


def vertex_plot(mesh: TriMesh, name: str, title=None, vertex_coord=None):
    """Mesh scatter + edges, optionally highlighting a selected vertex
    (deploy_dqn.py:272-296)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.scatter(mesh.coords[:, 0], mesh.coords[:, 1], color="k", s=5, zorder=1)
    _draw_mesh(ax, mesh)
    if title:
        ax.set_title(f"{title}: {mesh.num_vertices} Vertices", fontsize=14)
    if vertex_coord is not None:
        ax.scatter([vertex_coord[0]], [vertex_coord[1]], color="r", s=10, zorder=2)
    ax.autoscale()
    fig.savefig(f"{name}.png", bbox_inches="tight")
    plt.close(fig)


def plot_mesh(mesh: TriMesh, name="mesh", title=None, vertex_coords=None):
    """deploy_dqn.py:465-488."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.scatter(mesh.coords[:, 0], mesh.coords[:, 1], color="k", s=5, zorder=1)
    _draw_mesh(ax, mesh)
    if vertex_coords is not None:
        vc = np.asarray(vertex_coords)
        ax.scatter(vc[:, 0], vc[:, 1], color="r", s=10, zorder=2)
    if title:
        ax.set_title(title, fontsize=14)
    ax.autoscale()
    fig.savefig(f"{name}.png", bbox_inches="tight")
    plt.close(fig)


def plot_state(env, title="{}", filename="initial_state", plot_dir="."):
    """Observation-window plot (Env2DAirfoil.py:171-217): removable vs
    non-removable vertices, window membership, state-graph edges."""
    plt = _plt()
    import os

    from matplotlib.lines import Line2D

    mesh = env.mesh
    state = env.get_state()
    window = env._current_window
    coords = mesh.coords

    fig, ax = plt.subplots(figsize=(10, 5))
    removable = (~mesh.boundary_vertex_mask).astype(int)
    colors = np.array(["r", "k"])
    ax.scatter(coords[:, 0], coords[:, 1], color=colors[removable], s=6, zorder=1)
    _draw_mesh(ax, mesh, lw=0.75)
    ax.scatter(coords[window][:, 0], coords[window][:, 1], color="b", s=6, zorder=2)

    ei = np.asarray(state.edge_index)
    em = np.asarray(state.edge_mask)
    for k in np.flatnonzero(em):
        p1 = coords[window[ei[0, k]]]
        p2 = coords[window[ei[1, k]]]
        ax.plot([p1[0], p2[0]], [p1[1], p2[1]], color="b", lw=0.75)

    handles = [
        Line2D([0], [0], color="r", marker="o", lw=0, markersize=3),
        Line2D([0], [0], color="k", marker="o", lw=0.5, markersize=3),
        Line2D([0], [0], color="b", marker="o", lw=0.5, markersize=3),
    ]
    ax.legend(
        handles,
        ["Not Removable", "Removable - Not in State", "Removable - In State"],
        bbox_to_anchor=[0.05, 0.03, 0.93, 0],
        ncol=3,
        fontsize=12,
    )
    ax.set_title(title.format(env.n_closest), fontsize=18, y=0.975)
    ax.set_axis_off()
    fig.savefig(os.path.join(plot_dir, f"{filename}.png"), bbox_inches="tight")
    plt.close(fig)
