"""Resolution-parameterized channel+airfoil mesh generation.

The reference ships only two stock meshes plus 54-row resolution-sweep CSVs
(training_results/benchmark_results/*.csv, resolutions 0.05-0.3) produced by
an external mesh generator that is not in the repo.  This module regenerates
that family from geometry alone, so the de-facto regression table
(analyze_benchmark.py:25-33) can be reproduced from scratch:

* the airfoil geometry is the stock mesh's boundary ring VERBATIM — the
  reference's own sweep reused one fixed airfoil polygon at every
  resolution (its CSVs repeat NUM_COORDS across coarse resolutions, drag
  stays geometry-converged at ~-0.113 up to resolution 0.34, and the
  stock ring carries the coordinate file's leading/trailing-edge
  clustering: ys930 segment lengths 0.0009-0.0275 around a 0.0186
  median).  A periodic-spline resampling (`ring_mode='spline'`, the
  pre-round-2 default) destroys that clustering and measurably biases
  drag (-0.1076 vs -0.1131 at resolution 0.15);
* sizing is calibrated against the stock meshes' measured size field:
  near-wall size is GEOMETRY-derived (the ring's local segment length
  clipped to [0.25, 1.0] x its median — the reference's NUM_COORDS curve
  shows the airfoil lcar did not scale with resolution), growing to
  h = resolution along the normalized transition curve measured on the
  stock mesh (TRANSITION_D/F below); generated NUM_COORDS then track the
  reference CSVs within ~10% over resolutions 0.05-0.3 on BOTH airfoils;
* interior points come from Delaunay refinement (insert the circumcenter of
  any triangle whose circumradius exceeds the local size target — a
  Ruppert-style loop with boundary protection), followed by a few Laplacian
  smoothing sweeps for quality;
* the airfoil hole is carved by centroid point-in-polygon, and the ring
  vertices are stored contiguously in ring order so `airfoil_polyline`
  (marking.py:99) reconstructs a valid closed ring, as it does on the stock
  meshes.

Everything here is one-time host geometry work (NumPy/SciPy); the device
never sees it.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import Delaunay, cKDTree

from .marking import X_MAX, X_MIN, Y_MAX, Y_MIN
from .trimesh import TriMesh

AIRFOIL_REFINE = 8.0  # nominal h_airfoil = resolution / AIRFOIL_REFINE
GRADING = 0.35  # legacy spline-mode grading (h per unit distance)
SIZE_CLIP = (0.25, 1.0)  # local ring size clip, in units of median segment
# Verbatim mode: normalized size transition (h - s)/(h_far - s) as a
# function of distance to the airfoil, measured on the stock ys930 mesh
# (mean incident edge length per wall-distance bin; the same normalized
# curve fits ah93w145).  gmsh-style generators interpolate sizes from ALL
# boundaries, so the transition is domain-driven and resolution-invariant.
TRANSITION_D = (0.0, 0.035, 0.075, 0.15, 0.25, 0.4, 0.65, 1.0)
TRANSITION_F = (0.0, 0.073, 0.169, 0.339, 0.5, 0.766, 0.935, 1.0)
REFINE_FACTOR = 0.77  # split when circumradius exceeds this x target size
# (tuned so generated NUM_COORDS track the reference CSV within ~10%
# across resolutions 0.05-0.3)


def spline_ring(ring: np.ndarray, spacing: float) -> np.ndarray:
    """Resample a closed polyline through a periodic cubic spline at
    ~uniform arc-length `spacing`.  Returns (K, 2) ordered ring points."""
    from scipy.interpolate import splev, splprep

    pts = np.asarray(ring, dtype=np.float64)
    # splprep needs strictly increasing parameter; drop duplicate points.
    d = np.linalg.norm(np.diff(np.vstack([pts, pts[:1]]), axis=0), axis=1)
    keep = d > 1e-12
    pts = pts[keep]
    per = np.linalg.norm(np.diff(np.vstack([pts, pts[:1]]), axis=0), axis=1).sum()
    (tck, _) = splprep([pts[:, 0], pts[:, 1]], s=0, per=True)
    # Dense sample -> arc-length table -> uniform resample.
    tt = np.linspace(0.0, 1.0, 40 * len(pts), endpoint=False)
    xx, yy = splev(tt, tck)
    dense = np.stack([xx, yy], axis=1)
    seg = np.linalg.norm(np.diff(np.vstack([dense, dense[:1]]), axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])[:-1]
    k = max(8, int(round(per / spacing)))
    want = np.linspace(0.0, per, k, endpoint=False)
    idx = np.searchsorted(s, want)
    idx = np.clip(idx, 0, len(dense) - 1)
    return dense[idx]


def _ring_distance(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Distance to the closed ring polyline.

    Delegates to env.graph.polyline_distance, which dispatches to the
    native C++ kernel when built (~25x over the NumPy broadcast) — this
    runs for every centroid/candidate in each refinement round."""
    from ..env.graph import polyline_distance

    return polyline_distance(np.asarray(pts, np.float64), ring)


def _in_ring(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    from matplotlib.path import Path

    # NOTE: Path(ring, closed=True) would treat the LAST vertex as a
    # CLOSEPOLY marker and drop its coordinates from containment tests;
    # an implicitly-closed Path keeps every ring vertex.
    return Path(ring).contains_points(pts)


def _dedup_ring(ring: np.ndarray) -> np.ndarray:
    pts = np.asarray(ring, dtype=np.float64)
    d = np.linalg.norm(np.diff(np.vstack([pts, pts[:1]]), axis=0), axis=1)
    return pts[d > 1e-12]


def generate_channel_mesh(
    airfoil_ring: np.ndarray,
    resolution: float,
    airfoil_refine: float = AIRFOIL_REFINE,
    grading: float = GRADING,
    smooth_iters: int = 8,
    max_rounds: int = 60,
    seed: int = 0,
    ring_mode: str = "verbatim",
) -> TriMesh:
    """Generate a graded triangulation of the channel around the airfoil.

    airfoil_ring: (K, 2) ordered geometry ring (e.g. from airfoil_polyline
    on a stock mesh).  resolution: the reference sweep's size parameter
    (benchmark CSV RESOLUTION column).  ring_mode: 'verbatim' keeps the
    geometry polygon fixed across resolutions (the reference generator's
    behaviour — see module docstring); 'spline' resamples it uniformly at
    resolution/airfoil_refine (legacy behaviour, kept for comparison).
    """
    h_near = resolution / airfoil_refine
    h_far = resolution

    # --- boundary discretization --------------------------------------
    if ring_mode == "verbatim":
        ring = _dedup_ring(airfoil_ring)
        seg = np.linalg.norm(
            np.diff(np.vstack([ring, ring[:1]]), axis=0), axis=1
        )
        local = 0.5 * (seg + np.roll(seg, 1))  # mean adjacent segment
        # Near-wall size is GEOMETRY-derived, not resolution-derived: the
        # reference's NUM_COORDS curve (876@0.15 -> 3395@0.05, not the
        # ~7900 a res-proportional wall size would give) shows its
        # generator kept the airfoil lcar fixed while only the far field
        # scaled with resolution.
        med = np.median(seg)
        ring_size = np.clip(local, SIZE_CLIP[0] * med, SIZE_CLIP[1] * med)
    elif ring_mode == "spline":
        ring = spline_ring(airfoil_ring, h_near)
        ring_size = np.full(len(ring), h_near)
    else:
        raise ValueError(f"unknown ring_mode {ring_mode!r}")
    ring_tree = cKDTree(ring)

    def h_of(pts: np.ndarray) -> np.ndarray:
        d = _ring_distance(pts, ring)
        if ring_mode == "verbatim":
            s = ring_size[ring_tree.query(np.asarray(pts, np.float64))[1]]
            frac = np.interp(d, TRANSITION_D, TRANSITION_F)
            return np.minimum(h_far, s + (h_far - s) * frac)
        return np.minimum(h_far, h_near + grading * d * (h_far - h_near) / h_far)
    nx = max(2, int(round((X_MAX - X_MIN) / h_far)))
    ny = max(2, int(round((Y_MAX - Y_MIN) / h_far)))
    xs = np.linspace(X_MIN, X_MAX, nx + 1)
    ys = np.linspace(Y_MIN, Y_MAX, ny + 1)
    rect = np.concatenate(
        [
            np.stack([xs, np.full_like(xs, Y_MIN)], 1)[:-1],
            np.stack([np.full_like(ys, X_MAX), ys], 1)[:-1],
            np.stack([xs[::-1], np.full_like(xs, Y_MAX)], 1)[:-1],
            np.stack([np.full_like(ys, X_MIN), ys[::-1]], 1)[:-1],
        ]
    )

    # Ring first (contiguous, in order) so airfoil_polyline reconstructs it.
    fixed = np.vstack([ring, rect])
    n_fixed = len(fixed)
    pts = fixed.copy()

    # --- Delaunay refinement -------------------------------------------
    def inside_margin(pts: np.ndarray) -> np.ndarray:
        """Per-point keep-out distance from the ring: local in verbatim
        mode so the clustered leading/trailing-edge segments still admit
        nearby interior points."""
        if ring_mode == "verbatim":
            return 0.4 * ring_size[ring_tree.query(np.asarray(pts, np.float64))[1]]
        return np.full(len(pts), 0.4 * h_near)
    for _ in range(max_rounds):
        tri = Delaunay(pts)
        simp = tri.simplices
        a, b, c = pts[simp[:, 0]], pts[simp[:, 1]], pts[simp[:, 2]]
        # circumcenter/radius
        d2 = 2.0 * ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                    - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
        d2 = np.where(np.abs(d2) < 1e-14, 1e-14, d2)
        b2 = ((b - a) ** 2).sum(1)
        c2 = ((c - a) ** 2).sum(1)
        ux = a[:, 0] + ((c[:, 1] - a[:, 1]) * b2 - (b[:, 1] - a[:, 1]) * c2) / d2
        uy = a[:, 1] + ((b[:, 0] - a[:, 0]) * c2 - (c[:, 0] - a[:, 0]) * b2) / d2
        cc = np.stack([ux, uy], axis=1)
        R = np.linalg.norm(cc - a, axis=1)

        centroid = (a + b + c) / 3.0
        live = ~_in_ring(centroid, ring)  # ignore hole triangles
        target = h_of(centroid)
        over = live & (R > REFINE_FACTOR * target)

        cand = cc[over]
        if not len(cand):
            break
        # keep candidates inside the domain, clear of the boundary
        ok = (
            (cand[:, 0] > X_MIN + 0.3 * h_far)
            & (cand[:, 0] < X_MAX - 0.3 * h_far)
            & (cand[:, 1] > Y_MIN + 0.3 * h_far)
            & (cand[:, 1] < Y_MAX - 0.3 * h_far)
            & ~_in_ring(cand, ring)
            & (_ring_distance(cand, ring) > inside_margin(cand))
        )
        cand = cand[ok]
        if not len(cand):
            break
        # thin candidates against existing points and each other
        hc = h_of(cand)
        near = cKDTree(pts).query(cand, k=1)[0]
        keep = near > 0.6 * hc
        cand, hc = cand[keep], hc[keep]
        sel: list[int] = []
        if len(cand):
            ct = cKDTree(cand)
            taken = np.zeros(len(cand), dtype=bool)
            order = np.argsort(-hc)  # biggest gaps first
            for i in order:
                if taken[i]:
                    continue
                sel.append(i)
                for j in ct.query_ball_point(cand[i], 0.6 * hc[i]):
                    taken[j] = True
        if not sel:
            break
        pts = np.vstack([pts, cand[sel]])

    # --- final triangulation + hole carving ------------------------------
    # smooth_iters + 1 passes: each of the first smooth_iters passes
    # re-triangulates then moves points; the final pass re-triangulates the
    # LAST move and breaks, so the returned cells are always a Delaunay
    # triangulation of the returned coordinates.
    for _ in range(smooth_iters + 1):
        tri = Delaunay(pts)
        simp = tri.simplices
        centroid = pts[simp].mean(axis=1)
        keep_cells = ~_in_ring(centroid, ring)
        simp = simp[keep_cells]
        # Laplacian smooth interior (non-fixed) points over the kept cells.
        if smooth_iters <= 0:
            break
        nbr_sum = np.zeros_like(pts)
        nbr_cnt = np.zeros(len(pts))
        for i, j in ((0, 1), (1, 2), (2, 0)):
            np.add.at(nbr_sum, simp[:, i], pts[simp[:, j]])
            np.add.at(nbr_cnt, simp[:, i], 1.0)
            np.add.at(nbr_sum, simp[:, j], pts[simp[:, i]])
            np.add.at(nbr_cnt, simp[:, j], 1.0)
        movable = np.arange(len(pts)) >= n_fixed
        upd = nbr_sum[movable] / np.maximum(nbr_cnt[movable], 1.0)[:, None]
        pts[movable] = 0.5 * pts[movable] + 0.5 * upd
        smooth_iters -= 1

    # Drop any vertices orphaned by hole carving, preserving order.
    used = np.zeros(len(pts), dtype=bool)
    used[simp.ravel()] = True
    remap = -np.ones(len(pts), dtype=np.int64)
    remap[used] = np.arange(used.sum())
    cells = remap[simp].astype(np.int32)
    return TriMesh(coords=pts[used], cells=cells)
