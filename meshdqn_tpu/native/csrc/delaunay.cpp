// Bowyer–Watson Delaunay triangulation — native core.
//
// Replaces the Qhull dependency the reference reaches through
// scipy.spatial.Delaunay (Env2DAirfoil.py:487-493) for the per-removal
// global re-triangulation.  Point sets here are mesh vertex clouds
// (hundreds to a few thousand well-separated points), so a plain
// O(n^2) Bowyer–Watson with a double-precision incircle predicate and a
// relative tolerance is both fast (<~10 ms) and reliable; scipy remains
// available as a cross-validation oracle (tests/test_native.py).
//
// C ABI for ctypes.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Tri {
  int64_t a, b, c;
  bool alive;
};

inline double orient2d(const double* p, int64_t a, int64_t b, int64_t c) {
  const double ax = p[2 * a], ay = p[2 * a + 1];
  const double bx = p[2 * b], by = p[2 * b + 1];
  const double cx = p[2 * c], cy = p[2 * c + 1];
  return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
}

// >0 iff d lies inside the circumcircle of (a,b,c) given CCW orientation.
inline double incircle(const double* p, int64_t a, int64_t b, int64_t c,
                       int64_t d) {
  const double adx = p[2 * a] - p[2 * d], ady = p[2 * a + 1] - p[2 * d + 1];
  const double bdx = p[2 * b] - p[2 * d], bdy = p[2 * b + 1] - p[2 * d + 1];
  const double cdx = p[2 * c] - p[2 * d], cdy = p[2 * c + 1] - p[2 * d + 1];
  const double ad2 = adx * adx + ady * ady;
  const double bd2 = bdx * bdx + bdy * bdy;
  const double cd2 = cdx * cdx + cdy * cdy;
  return adx * (bdy * cd2 - cdy * bd2) - ady * (bdx * cd2 - cdx * bd2) +
         ad2 * (bdx * cdy - cdx * bdy);
}

}  // namespace

extern "C" {

// points   : (n, 2) row-major
// out_tris : (max_tris, 3) output buffer
// returns the number of triangles written, or -1 on failure / overflow.
int64_t delaunay_triangulate(const double* points_in, int64_t n,
                             int64_t* out_tris, int64_t max_tris) {
  if (n < 3) return -1;

  // Working copy with 3 super-triangle vertices appended.
  std::vector<double> pts(2 * (n + 3));
  double xmin = points_in[0], xmax = points_in[0];
  double ymin = points_in[1], ymax = points_in[1];
  for (int64_t i = 0; i < n; ++i) {
    pts[2 * i] = points_in[2 * i];
    pts[2 * i + 1] = points_in[2 * i + 1];
    xmin = std::fmin(xmin, pts[2 * i]);
    xmax = std::fmax(xmax, pts[2 * i]);
    ymin = std::fmin(ymin, pts[2 * i + 1]);
    ymax = std::fmax(ymax, pts[2 * i + 1]);
  }
  const double cx = 0.5 * (xmin + xmax), cy = 0.5 * (ymin + ymax);
  const double span = std::fmax(xmax - xmin, ymax - ymin) * 64.0 + 1.0;
  const int64_t s0 = n, s1 = n + 1, s2 = n + 2;
  pts[2 * s0] = cx - 2.0 * span; pts[2 * s0 + 1] = cy - span;
  pts[2 * s1] = cx + 2.0 * span; pts[2 * s1 + 1] = cy - span;
  pts[2 * s2] = cx;              pts[2 * s2 + 1] = cy + 2.0 * span;

  std::vector<Tri> tris;
  tris.reserve(4 * static_cast<size_t>(n));
  tris.push_back({s0, s1, s2, true});

  // Symbolic in-circumcircle test treating super-triangle vertices as
  // points at infinity (avoids the classic finite-super-triangle artifact
  // where hull slivers with huge circumcircles are mis-triangulated):
  //  * no super vertex : ordinary incircle;
  //  * one super vertex: the circumcircle limit is the half-plane left of
  //    the directed finite edge (u -> v) in the triangle's CCW order;
  //  * two super verts : the limit is the half-plane through the finite
  //    vertex u with boundary parallel to the far chord (s_i -> s_j).
  auto in_circum = [&](const Tri& t, int64_t p) -> bool {
    const bool sa = t.a >= n, sb = t.b >= n, sc = t.c >= n;
    const int ns = int(sa) + int(sb) + int(sc);
    const double* P = pts.data();
    if (ns == 0) return incircle(P, t.a, t.b, t.c, p) > 0.0;
    if (ns == 1) {
      int64_t u, v;  // finite edge in CCW order
      if (sa) { u = t.b; v = t.c; }
      else if (sb) { u = t.c; v = t.a; }
      else { u = t.a; v = t.b; }
      const double o = orient2d(P, u, v, p);
      if (o > 0.0) return true;
      if (o == 0.0) {
        // p exactly on the hull-edge line (common on the channel walls):
        // the triangle must open up when p falls within the segment span.
        const double ex = P[2 * v] - P[2 * u], ey = P[2 * v + 1] - P[2 * u + 1];
        const double px_ = P[2 * p] - P[2 * u], py_ = P[2 * p + 1] - P[2 * u + 1];
        const double s = px_ * ex + py_ * ey;
        return s > 0.0 && s < ex * ex + ey * ey;
      }
      return false;
    }
    if (ns == 2) {
      int64_t u, si, sj;  // cyclic order (u, si, sj)
      if (!sa) { u = t.a; si = t.b; sj = t.c; }
      else if (!sb) { u = t.b; si = t.c; sj = t.a; }
      else { u = t.c; si = t.a; sj = t.b; }
      const double dx = P[2 * sj] - P[2 * si];
      const double dy = P[2 * sj + 1] - P[2 * si + 1];
      const double px = P[2 * p] - P[2 * u];
      const double py = P[2 * p + 1] - P[2 * u + 1];
      // Disk interior lies toward the far chord: the side of the line
      // through u (parallel to si->sj) OPPOSITE to u's CCW-left position.
      return dx * py - dy * px < 0.0;
    }
    return false;  // the initial all-super triangle never tests here
  };

  std::vector<int64_t> bad;
  // Cavity boundary edges (a, b) with multiplicity tracking.
  std::vector<std::pair<int64_t, int64_t>> edges;

  for (int64_t ip = 0; ip < n; ++ip) {
    bad.clear();
    edges.clear();
    for (size_t t = 0; t < tris.size(); ++t) {
      if (!tris[t].alive) continue;
      // Triangles are maintained CCW.
      if (tris[t].a >= n && tris[t].b >= n && tris[t].c >= n) {
        // all-super root triangle contains every finite point
        bad.push_back(static_cast<int64_t>(t));
        continue;
      }
      if (in_circum(tris[t], ip)) bad.push_back(static_cast<int64_t>(t));
    }
    if (bad.empty()) return -1;  // degenerate input

    // Collect cavity boundary: edges appearing in exactly one bad triangle.
    for (int64_t tb : bad) {
      const Tri& t = tris[tb];
      const int64_t e[3][2] = {{t.a, t.b}, {t.b, t.c}, {t.c, t.a}};
      for (int k = 0; k < 3; ++k) {
        bool shared = false;
        for (size_t j = 0; j < edges.size(); ++j) {
          if (edges[j].first == e[k][1] && edges[j].second == e[k][0]) {
            edges.erase(edges.begin() + j);
            shared = true;
            break;
          }
        }
        if (!shared) edges.emplace_back(e[k][0], e[k][1]);
      }
      tris[tb].alive = false;
    }

    for (const auto& ed : edges) {
      Tri nt{ed.first, ed.second, ip, true};
      if (orient2d(pts.data(), nt.a, nt.b, nt.c) < 0.0) std::swap(nt.a, nt.b);
      tris.push_back(nt);
    }
  }

  int64_t count = 0;
  for (const Tri& t : tris) {
    if (!t.alive) continue;
    if (t.a >= n || t.b >= n || t.c >= n) continue;  // touches super-triangle
    if (count >= max_tris) return -1;
    out_tris[3 * count] = t.a;
    out_tris[3 * count + 1] = t.b;
    out_tris[3 * count + 2] = t.c;
    ++count;
  }
  return count;
}

}  // extern "C"
