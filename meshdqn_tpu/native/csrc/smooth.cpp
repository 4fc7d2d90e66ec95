// Damped Laplacian mesh smoothing — native core.
//
// Same semantics as meshdqn_tpu/mesh/smooth.py (itself replicating dolfin's
// C++ MeshSmoothing::smooth, which the reference invokes as mesh.smooth(50),
// flow_solver.py:66-67): Gauss–Seidel sweeps in vertex-index order, each
// interior vertex pulled toward the barycenter of its edge-neighbours with
// the displacement clamped to half the minimum perpendicular distance to the
// opposite facets of its star.  Operation order matches the NumPy
// implementation so results agree to the last bit.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// coords      : (V, 2) row-major, modified in place
// V           : vertex count
// nbr_indices : concatenated neighbour lists (ascending per vertex)
// nbr_offsets : (V+1,) CSR offsets into nbr_indices
// opp_a/opp_b : concatenated opposite-facet endpoint pairs per vertex
// opp_offsets : (V+1,) CSR offsets
// interior    : (K,) indices of interior vertices in ascending order
// K, iters
void smooth_mesh(double* coords, int64_t V, const int64_t* nbr_indices,
                 const int64_t* nbr_offsets, const int64_t* opp_a,
                 const int64_t* opp_b, const int64_t* opp_offsets,
                 const int64_t* interior, int64_t K, int64_t iters) {
  const double eps = 3.0e-16;  // DOLFIN_EPS
  for (int64_t it = 0; it < iters; ++it) {
    for (int64_t k = 0; k < K; ++k) {
      const int64_t v = interior[k];
      const double px = coords[2 * v];
      const double py = coords[2 * v + 1];

      // Barycenter of neighbours (sequential sum in ascending index order,
      // matching numpy's mean over the sorted neighbour array).
      double sx = 0.0, sy = 0.0;
      const int64_t nb = nbr_offsets[v], ne = nbr_offsets[v + 1];
      for (int64_t i = nb; i < ne; ++i) {
        const int64_t u = nbr_indices[i];
        sx += coords[2 * u];
        sy += coords[2 * u + 1];
      }
      const double n = static_cast<double>(ne - nb);
      const double bx = sx / n, by = sy / n;

      const double dx = bx - px, dy = by - py;
      const double r = std::sqrt(dx * dx + dy * dy);
      if (r < eps) continue;

      // Min perpendicular distance from p to the opposite-facet lines.
      double rmin = 0.0;
      bool first = true;
      const int64_t ob = opp_offsets[v], oe = opp_offsets[v + 1];
      for (int64_t i = ob; i < oe; ++i) {
        const int64_t a = opp_a[i], b = opp_b[i];
        const double ax = coords[2 * a], ay = coords[2 * a + 1];
        const double tx = coords[2 * b] - ax, ty = coords[2 * b + 1] - ay;
        const double tlen = std::sqrt(tx * tx + ty * ty);
        const double cross = std::fabs(tx * (py - ay) - ty * (px - ax));
        const double d = cross / tlen;
        if (first || d < rmin) { rmin = d; first = false; }
      }

      const double step = std::fmin(0.5 * rmin, r);
      coords[2 * v] = px + step * dx / r;
      coords[2 * v + 1] = py + step * dy / r;
    }
  }
}

}  // extern "C"
