"""Damped Laplacian mesh smoothing, dolfin-equivalent.

The reference calls dolfin `Mesh::smooth(50)` on load and after every remesh
(reference flow_solver.py:66-67, 236-237).  Dolfin's MeshSmoothing::smooth is
a Gauss–Seidel sweep: vertices are visited in index order, each interior
vertex is pulled toward the barycenter of its edge-neighbours, with the
displacement clamped to half the minimum distance from the vertex to the
opposite facets of its star (so cells cannot invert).  Boundary vertices
never move.

Two implementations with identical semantics:
* a native C++ core (meshdqn_tpu/native/csrc/smooth.cpp, ~1000x the Python
  sweep) used by default when the toolchain is available — smoothing runs on
  every remesh, i.e. every environment step, so it is the host-side hot
  path;
* the pure-NumPy sweep below as the portable fallback and cross-check
  (tests/test_native.py verifies bitwise-level agreement).
"""
from __future__ import annotations

import numpy as np

from .trimesh import TriMesh


def _star_topology(mesh: TriMesh):
    """CSR neighbour lists + per-vertex opposite-facet endpoint pairs."""
    coords = mesh.coords
    cells = mesh.cells
    V = len(coords)

    # Neighbours via edges, ascending per vertex.
    e = mesh.edges
    both = np.concatenate([e, e[:, ::-1]], axis=0)
    order = np.lexsort((both[:, 1], both[:, 0]))
    both = both[order]
    nbr_indices = both[:, 1].astype(np.int64)
    nbr_offsets = np.zeros(V + 1, dtype=np.int64)
    np.add.at(nbr_offsets, both[:, 0] + 1, 1)
    nbr_offsets = np.cumsum(nbr_offsets)

    # Incident cells: for each (vertex, cell) pair, the two other vertices.
    vc_v = cells.ravel().astype(np.int64)  # vertex of each (cell, slot)
    C = len(cells)
    cell_ids = np.repeat(np.arange(C), 3)
    order = np.argsort(vc_v, kind="stable")
    vc_v = vc_v[order]
    vc_c = cell_ids[order]
    slot = np.tile(np.arange(3), C)[order]
    others = np.array([[1, 2], [0, 2], [0, 1]])
    opp = cells[vc_c[:, None], others[slot]]  # (K, 2)
    opp_a = opp[:, 0].astype(np.int64)
    opp_b = opp[:, 1].astype(np.int64)
    opp_offsets = np.zeros(V + 1, dtype=np.int64)
    np.add.at(opp_offsets, vc_v + 1, 1)
    opp_offsets = np.cumsum(opp_offsets)

    interior = np.flatnonzero(~mesh.boundary_vertex_mask).astype(np.int64)
    return nbr_indices, nbr_offsets, opp_a, opp_b, opp_offsets, interior


def smooth(mesh: TriMesh, num_iterations: int = 50, use_native: bool = True) -> TriMesh:
    """Return a new TriMesh with smoothed interior vertex positions."""
    if use_native:
        try:
            # Fully-native path: the star topology is built inside the C++
            # call from raw cells (the NumPy `_star_topology` prep cost
            # ~2.9 ms per removal on the env hot path; bit parity with the
            # prep+smooth_native path is asserted in tests/test_native.py).
            from ..native import smooth_cells_native

            coords = smooth_cells_native(
                mesh.coords, mesh.cells, mesh.boundary_vertex_mask,
                num_iterations,
            )
            # Connectivity is untouched -> share the topology instead of
            # re-running edge extraction (with_coords).
            return mesh.with_coords(coords)
        except RuntimeError:
            pass
    return _smooth_python(mesh, _star_topology(mesh), num_iterations)


def _smooth_python(mesh: TriMesh, topo, num_iterations: int) -> TriMesh:
    nbr_indices, nbr_offsets, opp_a, opp_b, opp_offsets, interior = topo
    coords = mesh.coords.copy()
    eps = 3.0e-16  # DOLFIN_EPS

    for _ in range(num_iterations):
        for v in interior:
            p = coords[v]
            nb, ne = nbr_offsets[v], nbr_offsets[v + 1]
            bary = coords[nbr_indices[nb:ne]].mean(axis=0)
            d = bary - p
            r = float(np.sqrt(d @ d))
            if r < eps:
                continue
            ob, oe = opp_offsets[v], opp_offsets[v + 1]
            a = coords[opp_a[ob:oe]]
            b = coords[opp_b[ob:oe]]
            t = b - a
            tlen = np.sqrt((t * t).sum(axis=1))
            cross = np.abs(t[:, 0] * (p[1] - a[:, 1]) - t[:, 1] * (p[0] - a[:, 0]))
            rmin = float(np.min(cross / tlen))
            step = min(0.5 * rmin, r)
            coords[v] = p + step * d / r

    return mesh.with_coords(coords)
