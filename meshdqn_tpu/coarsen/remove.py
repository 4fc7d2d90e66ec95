"""Vertex removal + global Delaunay re-triangulation + hole carving.

Replicates the effective behaviour of the reference's `_remove_vertex`
(Env2DAirfoil.py:452-512):

1. delete the chosen vertex's coordinate row;
2. re-triangulate ALL remaining points with a global Delaunay (the reference
   uses scipy/Qhull; the convex triangulation fills the carved airfoil
   hole and the full channel rectangle);
3. drop every cell whose three vertices are all boundary vertices of the
   *pre-removal* mesh — this carves the airfoil hole back out
   (Env2DAirfoil.py:496);
4. build the new mesh; validity failures roll back (return the old mesh).

The reference also mutates `cells` before the Delaunay call
(Env2DAirfoil.py:475-477) — dead code, since the fresh triangulation
discards it (SURVEY.md §2a) — not replicated.

Host-side by design: re-triangulation is irregular integer work the TPU has
no business doing; everything downstream of it (interpolation, probes,
rewards) is device code.  Validity gating is the minimal set matching the
reference's failure surface: triangulation success, no zero-area cells
(`min_area`), and no orphan vertices — thin-but-valid slivers are allowed
through exactly as Qhull produces them for the reference, whose episodes
then end through the NaN/threshold traps if such a cell corrupts the
probes (Env2DAirfoil.py:372-397).
"""
from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum

import numpy as np
from scipy.spatial import Delaunay, QhullError

from ..mesh import TriMesh


class RemovalStatus(IntEnum):
    """Matches the reference's return codes (Env2DAirfoil.py:342-364)."""

    OK = 0
    ALREADY_REMOVED = 1
    BROKE_MESH = 2


@dataclass
class RemovalResult:
    status: RemovalStatus
    mesh: TriMesh | None  # new mesh if OK else None
    removed_coordinate: np.ndarray | None


def _triangulate(points: np.ndarray, backend: str) -> np.ndarray:
    """Global Delaunay of the point set.

    backend 'native' uses our Bowyer–Watson C++ core (meshdqn_tpu/native),
    which reproduces Qhull's triangle set exactly on the stock meshes
    (tests/test_native.py); 'scipy' is the Qhull path the reference uses
    (Env2DAirfoil.py:487).  'auto' prefers scipy — identical output, and
    Qhull is ~1.7x faster at these sizes (876 pts: 14 vs 24 ms/call on the
    training host), which matters because this is the single largest host
    cost of the env step — with the native core as fallback.
    """
    if backend == "native":
        from ..native import delaunay_native

        return delaunay_native(points)
    if backend == "auto":
        try:
            return Delaunay(points).simplices.astype(np.int32)
        except QhullError:
            from ..native import delaunay_native

            return delaunay_native(points)
    return Delaunay(points).simplices.astype(np.int32)


def remove_vertex(
    mesh: TriMesh,
    vertex: int,
    removable_mask: np.ndarray | None = None,
    min_area: float = 1e-14,
    backend: str = "auto",
) -> RemovalResult:
    """Remove `vertex` (index into mesh.coords) and re-triangulate.

    removable_mask: (V,) bool; non-removable (boundary) vertices may not be
    deleted — mirrors the `selected_coord in self.removable` guard
    (Env2DAirfoil.py:549).

    backend 'cavity' dispatches to the O(star) local cavity fill
    (coarsen/cavity.py) instead of a global re-triangulation, falling back
    to the global path when the cavity is unfillable.
    """
    if backend == "cavity":
        from .cavity import remove_vertex_cavity

        res = remove_vertex_cavity(mesh, vertex, removable_mask, min_area)
        if res.status == RemovalStatus.OK:
            return res
        backend = "auto"  # unfillable cavity: global-Delaunay fallback
    V = mesh.num_vertices
    if vertex < 0 or vertex >= V:
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)
    if removable_mask is None:
        removable_mask = ~mesh.boundary_vertex_mask
    if not removable_mask[vertex]:
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)

    coords = mesh.coords
    removed_coord = coords[vertex].copy()

    # Boundary vertices of the current mesh, reindexed after deletion
    # (Env2DAirfoil.py:464-477).
    boundary = mesh.boundary_vertices().astype(np.int64)
    boundary = boundary[boundary != vertex]
    boundary = np.where(boundary > vertex, boundary - 1, boundary)

    new_coords = np.delete(coords, vertex, axis=0)

    try:
        cells = _triangulate(new_coords, backend)
    except (QhullError, ValueError, RuntimeError):
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)
    # Hole carving: drop cells made only of boundary vertices
    # (Env2DAirfoil.py:496).  Note this is the *reference's* rule: it also
    # removes any all-boundary sliver along the outer walls.
    keep = np.sum(np.isin(cells, boundary), axis=1) != 3
    cells = cells[keep]

    if len(cells) == 0:
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)

    new_mesh = TriMesh(coords=new_coords, cells=cells)

    # Validity: no degenerate cells, every vertex still referenced.
    if new_mesh.cell_volumes().min() < min_area:
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)
    used = np.zeros(len(new_coords), dtype=bool)
    used[cells.ravel()] = True
    if not used.all():
        # Orphan vertex: interpolation/probes would operate on a mesh that
        # no longer covers it -> treat as broken (reference hits this as a
        # dolfin failure later and rolls back likewise).
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)

    return RemovalResult(RemovalStatus.OK, new_mesh, removed_coord)
