"""Damped Laplacian mesh smoothing, dolfin-equivalent.

The reference calls dolfin `Mesh::smooth(50)` on load and after every remesh
(reference flow_solver.py:66-67, 236-237).  Dolfin's MeshSmoothing::smooth is a
Gauss–Seidel sweep: vertices are visited in index order, each interior vertex
is pulled toward the barycenter of its edge-neighbours, with the displacement
clamped to half the minimum distance from the vertex to the opposite facets of
its star (so cells cannot invert).  Boundary vertices never move.

This module reproduces those semantics in NumPy.  It is a one-time,
host-side preprocessing step (the solve itself never moves vertices), so a
sequential sweep is fine; the inner loop is vectorised over each vertex's
star.
"""
from __future__ import annotations

import numpy as np

from .trimesh import TriMesh


def smooth(mesh: TriMesh, num_iterations: int = 50) -> TriMesh:
    """Return a new TriMesh with smoothed interior vertex positions."""
    coords = mesh.coords.copy()
    cells = mesh.cells
    V = len(coords)

    on_boundary = mesh.boundary_vertex_mask

    # vertex -> neighbour vertices (via edges), and vertex -> incident cells
    neighbors: list[list[int]] = [[] for _ in range(V)]
    for a, b in mesh.edges:
        neighbors[a].append(b)
        neighbors[b].append(a)
    vertex_cells: list[list[int]] = [[] for _ in range(V)]
    for ci, cell in enumerate(cells):
        for v in cell:
            vertex_cells[v].append(ci)

    nbr = [np.array(n, dtype=np.int64) for n in neighbors]
    # For each interior vertex, precompute for every incident cell the two
    # opposite-facet endpoints (the facet opposite the vertex in that cell).
    opp_a = [None] * V
    opp_b = [None] * V
    for v in range(V):
        if on_boundary[v]:
            continue
        cs = cells[vertex_cells[v]]  # (k,3)
        # The two vertices of each incident cell that are not v.
        others = np.array([[x for x in c if x != v] for c in cs], dtype=np.int64)
        opp_a[v] = others[:, 0]
        opp_b[v] = others[:, 1]

    interior = np.flatnonzero(~on_boundary)
    eps = 3.0e-16  # DOLFIN_EPS

    for _ in range(num_iterations):
        for v in interior:
            p = coords[v]
            bary = coords[nbr[v]].mean(axis=0)
            d = bary - p
            r = float(np.sqrt(d @ d))
            if r < eps:
                continue
            # Distance from p to each opposite facet line (facet = (a, b)).
            a = coords[opp_a[v]]
            b = coords[opp_b[v]]
            t = b - a
            tlen = np.linalg.norm(t, axis=1)
            # Perpendicular distance from p to the line through a-b.
            cross = np.abs(t[:, 0] * (p[1] - a[:, 1]) - t[:, 1] * (p[0] - a[:, 0]))
            rmin = float(np.min(cross / tlen))
            step = min(0.5 * rmin, r)
            coords[v] = p + step * d / r

    return TriMesh(coords=coords, cells=cells)
