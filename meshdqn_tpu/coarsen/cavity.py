"""Local cavity re-triangulation: O(star) vertex removal.

The reference removes a vertex by re-running a GLOBAL Delaunay over all
remaining points (Env2DAirfoil.py:487-493) — O(V log V) per removal and
inherently host-side.  But deleting one interior vertex only invalidates its
*star* (the cells incident to it); the rest of the mesh is untouched.  This
module re-triangulates just the star's cavity polygon (the link of the
removed vertex) with a constrained-Delaunay ear fill — bounded work
(typical link size 5-9, hard budget `K`), which is why the same algorithm
also exists here as a jittable fixed-budget JAX kernel (`cavity_fill_jax`).

Semantics vs the global path (`coarsen.remove.remove_vertex`):

* If the pre-removal mesh is Delaunay, filling the cavity with the Delaunay
  triangulation of the link polygon reproduces the global Delaunay of the
  remaining points restricted to the cavity (the classical incremental-
  deletion identity) — `tests/test_cavity.py` asserts triangle-set equality
  on random Delaunay meshes.
* On the airfoil meshes (smoothed, hole-carved — NOT globally Delaunay) the
  global path may flip edges arbitrarily far from the removed vertex; the
  cavity path by construction perturbs nothing outside the star and
  preserves total mesh area exactly.  It is validated structurally
  (area conservation, non-star cells untouched, validity gates) rather
  than by bit-parity with Qhull.

The ear fill picks, among valid ears (convex, no link vertex inside the
ear triangle), the one with the fewest circumcircle violations, tie-broken
by largest minimum angle — a deterministic constrained-Delaunay fill (every
simple polygon admits one; the two-ears theorem guarantees progress).
"""
from __future__ import annotations

import numpy as np

from ..mesh import TriMesh
from .remove import RemovalResult, RemovalStatus


def extract_cavity(mesh: TriMesh, vertex: int):
    """Star cells of `vertex` and its link as an ordered CCW polygon.

    Returns (star_cell_ids, link_vertex_ids) or None if the link is not a
    single closed loop (boundary vertex / non-manifold star).
    """
    cells = mesh.cells
    star = np.flatnonzero((cells == vertex).any(axis=1))
    if len(star) < 3:
        return None
    coords = mesh.coords

    # Each star cell contributes its edge opposite `vertex`, oriented so the
    # triangle (vertex, a, b) is CCW: then the edges a->b chain into the
    # link loop traversed CCW around the cavity.
    succ: dict[int, int] = {}
    for c in star:
        tri = cells[c]
        rest = [int(t) for t in tri if t != vertex]
        if len(rest) != 2:
            return None  # duplicated vertex in cell
        a, b = rest
        pv, pa, pb = coords[vertex], coords[a], coords[b]
        cr = (pa[0] - pv[0]) * (pb[1] - pv[1]) - (pa[1] - pv[1]) * (pb[0] - pv[0])
        if cr < 0.0:
            a, b = b, a
        if a in succ:
            return None  # non-manifold
        succ[a] = b

    start = next(iter(succ))
    loop = [start]
    cur = succ[start]
    while cur != start:
        loop.append(cur)
        nxt = succ.get(cur)
        if nxt is None or len(loop) > len(succ):
            return None  # open chain (boundary vertex) or tangled star
        cur = nxt
    if len(loop) != len(succ):
        return None
    return star, np.asarray(loop, dtype=np.int64)


def _incircle(a, b, c, d):
    """>0 iff d is strictly inside the circumcircle of CCW triangle abc."""
    m = np.array(
        [
            [a[0] - d[0], a[1] - d[1], (a[0] - d[0]) ** 2 + (a[1] - d[1]) ** 2],
            [b[0] - d[0], b[1] - d[1], (b[0] - d[0]) ** 2 + (b[1] - d[1]) ** 2],
            [c[0] - d[0], c[1] - d[1], (c[0] - d[0]) ** 2 + (c[1] - d[1]) ** 2],
        ]
    )
    return np.linalg.det(m)


def _min_angle(a, b, c):
    v = [b - a, c - b, a - c]
    ang = []
    for i in range(3):
        u, w = -v[i - 1], v[i]
        cosv = np.dot(u, w) / max(np.linalg.norm(u) * np.linalg.norm(w), 1e-300)
        ang.append(np.arccos(np.clip(cosv, -1.0, 1.0)))
    return min(ang)


def delaunay_ear_fill(poly: np.ndarray) -> np.ndarray | None:
    """Constrained-Delaunay triangulation of a simple polygon by ear clipping.

    poly : (K, 2) vertex coordinates in CCW order.
    Returns (K-2, 3) triangles as indices into poly, or None if no valid ear
    exists at some step (degenerate/self-intersecting input).

    The inner loops are pure-scalar Python math: for typical link sizes
    (K 5-9) the per-call overhead of numpy kernels dominated the host
    removal path (profiled ~7.6 ms/removal, ~1.4k tiny numpy calls) — the
    scalar rewrite does the identical arithmetic (same cofactor expansion
    as `cavity_fill_jax`, asserted triangle-for-triangle in tests) at a
    fraction of the cost.
    """
    import math

    K = len(poly)
    if K < 3:
        return None
    px = [float(q[0]) for q in poly]
    py = [float(q[1]) for q in poly]

    def min_angle(ax, ay, bx, by, cx, cy):
        # angle at each corner between its two incident edges
        best = 4.0
        for (ox, oy, ux, uy, wx, wy) in (
            (ax, ay, cx, cy, bx, by),
            (bx, by, ax, ay, cx, cy),
            (cx, cy, bx, by, ax, ay),
        ):
            e1x, e1y = ux - ox, uy - oy
            e2x, e2y = wx - ox, wy - oy
            nn = math.sqrt(
                (e1x * e1x + e1y * e1y) * (e2x * e2x + e2y * e2y)
            )
            cosv = (e1x * e2x + e1y * e2y) / max(nn, 1e-300)
            a = math.acos(min(1.0, max(-1.0, cosv)))
            if a < best:
                best = a
        return best

    active = list(range(K))
    tris = []
    while len(active) > 3:
        best, best_score = None, None
        m = len(active)
        for s in range(m):
            p, i, n = active[s - 1], active[s], active[(s + 1) % m]
            ax, ay = px[p], py[p]
            bx, by = px[i], py[i]
            cx, cy = px[n], py[n]
            cr = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            if cr <= 0.0:
                continue  # reflex or degenerate corner
            # Ear must contain no other active vertex (strictly).
            inside = False
            violations = 0
            for j in active:
                if j == p or j == i or j == n:
                    continue
                dx, dy = px[j], py[j]
                w0 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
                w1 = (cx - bx) * (dy - by) - (cy - by) * (dx - bx)
                w2 = (ax - cx) * (dy - cy) - (ay - cy) * (dx - cx)
                if w0 > 0.0 and w1 > 0.0 and w2 > 0.0:
                    inside = True
                    break
                # incircle cofactor expansion (same formula as cavity_fill_jax)
                adx, ady = ax - dx, ay - dy
                bdx, bdy = bx - dx, by - dy
                cdx, cdy = cx - dx, cy - dy
                ad2 = adx * adx + ady * ady
                bd2 = bdx * bdx + bdy * bdy
                cd2 = cdx * cdx + cdy * cdy
                det = (
                    adx * (bdy * cd2 - bd2 * cdy)
                    - ady * (bdx * cd2 - bd2 * cdx)
                    + ad2 * (bdx * cdy - bdy * cdx)
                )
                if det > 0.0:
                    violations += 1
            if inside:
                continue
            score = -1000.0 * violations + min_angle(ax, ay, bx, by, cx, cy)
            if best_score is None or score > best_score:
                best, best_score = s, score
        if best is None:
            return None
        p, i, n = active[best - 1], active[best], active[(best + 1) % len(active)]
        tris.append((p, i, n))
        active.pop(best)
    p, i, n = active
    cr = (px[i] - px[p]) * (py[n] - py[p]) - (py[i] - py[p]) * (px[n] - px[p])
    if cr <= 0.0:
        return None
    tris.append((p, i, n))
    return np.asarray(tris, dtype=np.int64)


def remove_vertex_cavity(
    mesh: TriMesh,
    vertex: int,
    removable_mask: np.ndarray | None = None,
    min_area: float = 1e-14,
) -> RemovalResult:
    """Remove `vertex` by local cavity re-triangulation.

    Same contract as `coarsen.remove.remove_vertex`, but O(star) instead of
    O(V log V), and it never perturbs cells outside the star.  Interior
    vertices only (a boundary vertex has an open link -> BROKE_MESH, exactly
    the vertices the removable mask already excludes).
    """
    V = mesh.num_vertices
    if vertex < 0 or vertex >= V:
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)
    if removable_mask is None:
        removable_mask = ~mesh.boundary_vertex_mask
    if not removable_mask[vertex]:
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)

    cav = extract_cavity(mesh, vertex)
    if cav is None:
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)
    star, link = cav

    fill = delaunay_ear_fill(mesh.coords[link])
    if fill is None:
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)
    new_local = link[fill]  # (K-2, 3) global vertex ids (pre-deletion)

    keep = np.ones(mesh.num_cells, dtype=bool)
    keep[star] = False
    cells = np.concatenate([mesh.cells[keep].astype(np.int64), new_local], axis=0)
    # Delete the coordinate row; reindex ids above it (Env2DAirfoil.py:480-484).
    cells = np.where(cells > vertex, cells - 1, cells).astype(np.int32)
    new_coords = np.delete(mesh.coords, vertex, axis=0)

    new_mesh = TriMesh(coords=new_coords, cells=cells)
    if new_mesh.cell_volumes().min() < min_area:
        return RemovalResult(RemovalStatus.BROKE_MESH, None, None)
    return RemovalResult(
        RemovalStatus.OK, new_mesh, mesh.coords[vertex].copy()
    )


# ----------------------------------------------------------------------
# Jittable fixed-budget ear fill.
# ----------------------------------------------------------------------
def cavity_fill_jax(poly, mask):
    """JAX version of `delaunay_ear_fill` under a fixed budget.

    poly : (K, 2) float array, CCW polygon coordinates (padded rows arbitrary)
    mask : (K,) bool, True for real polygon vertices
    Returns (tris, tri_mask): (K-2, 3) int32 indices into poly and a validity
    mask.  Matches the NumPy fill's ear choice (fewest circumcircle
    violations, then max min-angle; first-max tie-break), so the two agree
    triangle-for-triangle on the same input — asserted in tests.

    Everything is masked static-shape arithmetic: one `fori_loop` iteration
    clips one ear, so the whole fill is K-2 iterations of O(K^2) vectorized
    predicate work — bounded, branch-free, and fusable when vmapped over a
    batch of cavities (the intended use: batched removals across parallel
    envs).
    """
    import jax
    import jax.numpy as jnp

    poly = jnp.asarray(poly)
    K = poly.shape[0]
    NEG = jnp.float64(-1e30) if poly.dtype == jnp.float64 else jnp.float32(-1e30)

    def ring_neighbors(active):
        """prev/next active slot for each slot, cyclic over active slots."""
        idx = jnp.arange(K)
        fwd = (idx[:, None] + idx[None, 1:K]) % K  # (K, K-1) slots after i
        bwd = (idx[:, None] - idx[None, 1:K]) % K
        nxt = fwd[jnp.arange(K), jnp.argmax(active[fwd], axis=1)]
        prv = bwd[jnp.arange(K), jnp.argmax(active[bwd], axis=1)]
        return prv, nxt

    def cross2(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]
        ) * (b[..., 0] - o[..., 0])

    def incircle(a, b, c, d):
        ax, ay = a[..., 0] - d[..., 0], a[..., 1] - d[..., 1]
        bx, by = b[..., 0] - d[..., 0], b[..., 1] - d[..., 1]
        cx, cy = c[..., 0] - d[..., 0], c[..., 1] - d[..., 1]
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        return (
            ax * (by * c2 - b2 * cy)
            - ay * (bx * c2 - b2 * cx)
            + a2 * (bx * cy - by * cx)
        )

    def min_angle(a, b, c):
        def ang(u, w):
            nu = jnp.sqrt(jnp.sum(u * u, -1))
            nw = jnp.sqrt(jnp.sum(w * w, -1))
            cosv = jnp.sum(u * w, -1) / jnp.maximum(nu * nw, 1e-300)
            return jnp.arccos(jnp.clip(cosv, -1.0, 1.0))

        return jnp.minimum(
            jnp.minimum(ang(b - a, c - a), ang(a - b, c - b)), ang(a - c, b - c)
        )

    def body(t, carry):
        active, tris, tri_mask = carry
        n_active = jnp.sum(active)
        prv, nxt = ring_neighbors(active)
        pa, pb, pc = poly[prv], poly, poly[nxt]  # (K,2) ear at each slot
        convex = cross2(pa, pb, pc) > 0.0

        # others: active slots not in {prv, i, nxt}
        idx = jnp.arange(K)
        others = (
            active[None, :]
            & (idx[None, :] != idx[:, None])
            & (idx[None, :] != prv[:, None])
            & (idx[None, :] != nxt[:, None])
        )  # (K_ear, K_other)
        d = poly[None, :, :]  # (1, K, 2)
        w0 = cross2(pa[:, None], pb[:, None], d)
        w1 = cross2(pb[:, None], pc[:, None], d)
        w2 = cross2(pc[:, None], pa[:, None], d)
        inside = (w0 > 0.0) & (w1 > 0.0) & (w2 > 0.0)
        any_inside = jnp.any(inside & others, axis=1)
        viol = jnp.sum(
            (incircle(pa[:, None], pb[:, None], pc[:, None], d) > 0.0) & others,
            axis=1,
        )
        valid = active & convex & ~any_inside
        score = -1000.0 * viol.astype(poly.dtype) + min_angle(pa, pb, pc)
        score = jnp.where(valid, score, NEG)
        best = jnp.argmax(score)

        do_clip = (n_active > 3) & (score[best] > NEG)
        tri = jnp.stack([prv[best], best, nxt[best]]).astype(jnp.int32)
        tris = tris.at[t].set(jnp.where(do_clip, tri, tris[t]))
        tri_mask = tri_mask.at[t].set(do_clip | tri_mask[t])
        active = active.at[best].set(jnp.where(do_clip, False, active[best]))
        return active, tris, tri_mask

    tris0 = jnp.zeros((K - 2, 3), jnp.int32)
    mask0 = jnp.zeros(K - 2, bool)
    active, tris, tri_mask = jax.lax.fori_loop(
        0, K - 3, body, (jnp.asarray(mask), tris0, mask0)
    )

    # Final triangle: the 3 remaining active slots in ring order.
    n_active = jnp.sum(active)
    idx = jnp.arange(K)
    order = jnp.argsort(jnp.where(active, idx, K + idx))
    a0, a1, a2 = order[0], order[1], order[2]
    last = jnp.stack([a0, a1, a2]).astype(jnp.int32)
    # Mirror the NumPy fill's final check (delaunay_ear_fill: cr <= 0 ->
    # None): a clockwise/degenerate last triangle invalidates the fill.
    ok = (n_active == 3) & (cross2(poly[a0], poly[a1], poly[a2]) > 0.0)
    t_last = jnp.sum(tri_mask)  # next free slot
    tris = tris.at[t_last].set(jnp.where(ok, last, tris[jnp.minimum(t_last, K - 3)]))
    tri_mask = tri_mask.at[t_last].set(ok)
    return tris, tri_mask
