// Host geometry kernels.
//
// polyline_min_dist: distance from each query point to a closed polyline
// (the airfoil ring).  Replaces the O(P*K) NumPy broadcast in
// env/graph.py:polyline_distance (itself the GEOS/shapely replacement for
// Env2DAirfoil.py:239-241) — the per-removal window rebuild calls this for
// every mesh vertex, and the NumPy temporaries made it the single largest
// host cost of an env step (~23 ms/removal profiled); this loop is <1 ms.
#include <cmath>
#include <cstdint>

extern "C" {

// pts: (n, 2) row-major, ring: (k, 2) closed implicitly (segment k-1 -> 0).
// out: (n,) min distance.
void polyline_min_dist(const double* pts, int64_t n, const double* ring,
                       int64_t k, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    const double px = pts[2 * i], py = pts[2 * i + 1];
    double best = INFINITY;
    for (int64_t j = 0; j < k; ++j) {
      const int64_t j2 = (j + 1 == k) ? 0 : j + 1;
      const double ax = ring[2 * j], ay = ring[2 * j + 1];
      const double abx = ring[2 * j2] - ax, aby = ring[2 * j2 + 1] - ay;
      const double ab2 = abx * abx + aby * aby;
      const double apx = px - ax, apy = py - ay;
      double t = (apx * abx + apy * aby) / (ab2 > 1e-300 ? ab2 : 1e-300);
      t = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
      const double dx = apx - t * abx, dy = apy - t * aby;
      const double d2 = dx * dx + dy * dy;
      if (d2 < best) best = d2;
    }
    out[i] = std::sqrt(best);
  }
}

}  // extern "C"
