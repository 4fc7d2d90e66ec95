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

#include <algorithm>
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

extern "C" {

// Build the star topology from raw cells and smooth in one native call —
// replaces the NumPy `_star_topology` prep (lexsort over 2E edges +
// stable argsort over 3C slots, ~2.9 ms per removal on the env hot path).
// Neighbour lists are ASCENDING per vertex so the sequential barycenter
// sum matches the NumPy/smooth_mesh path to the last bit.
//
// coords        : (V, 2) row-major, modified in place
// cells         : (C, 3) int64
// boundary_mask : (V,) uint8, 1 = boundary vertex (from TriMesh topology)
void smooth_mesh_cells(double* coords, int64_t V, const int64_t* cells,
                       int64_t C, const uint8_t* boundary_mask,
                       int64_t iters) {
  // Per-vertex neighbour sets (deduplicated, then sorted ascending).
  std::vector<std::vector<int64_t>> nbr(V);
  // Opposite-facet endpoint pairs per vertex (order irrelevant: min-reduce).
  std::vector<std::vector<int64_t>> opp(V);  // flattened (a, b) pairs
  for (int64_t c = 0; c < C; ++c) {
    const int64_t a = cells[3 * c], b = cells[3 * c + 1], d = cells[3 * c + 2];
    const int64_t tri[3] = {a, b, d};
    for (int k = 0; k < 3; ++k) {
      const int64_t v = tri[k];
      const int64_t o1 = tri[(k + 1) % 3], o2 = tri[(k + 2) % 3];
      nbr[v].push_back(o1);
      nbr[v].push_back(o2);
      opp[v].push_back(o1);
      opp[v].push_back(o2);
    }
  }
  std::vector<int64_t> nbr_indices, nbr_offsets(V + 1, 0);
  std::vector<int64_t> opp_a, opp_b, opp_offsets(V + 1, 0);
  std::vector<int64_t> interior;
  nbr_indices.reserve(6 * static_cast<size_t>(V));
  for (int64_t v = 0; v < V; ++v) {
    auto& ns = nbr[v];
    std::sort(ns.begin(), ns.end());
    ns.erase(std::unique(ns.begin(), ns.end()), ns.end());
    nbr_indices.insert(nbr_indices.end(), ns.begin(), ns.end());
    nbr_offsets[v + 1] = static_cast<int64_t>(nbr_indices.size());
    const auto& os_ = opp[v];
    for (size_t i = 0; i + 1 < os_.size(); i += 2) {
      opp_a.push_back(os_[i]);
      opp_b.push_back(os_[i + 1]);
    }
    opp_offsets[v + 1] = static_cast<int64_t>(opp_a.size());
    if (!boundary_mask[v]) interior.push_back(v);
  }
  smooth_mesh(coords, V, nbr_indices.data(), nbr_offsets.data(),
              opp_a.data(), opp_b.data(), opp_offsets.data(),
              interior.data(), static_cast<int64_t>(interior.size()), iters);
}

}  // extern "C"
