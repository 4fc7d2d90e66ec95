import numpy as np
import pytest

from meshdqn_tpu.mesh import TriMesh, read_xdmf
from meshdqn_tpu.mesh.smooth import _smooth_python, _star_topology, smooth
from meshdqn_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


class TestNativeSmooth:
    def test_matches_python_exactly(self, ys930_path):
        mesh = read_xdmf(ys930_path)
        sm_native = smooth(mesh, 50, use_native=True)
        sm_python = _smooth_python(mesh, _star_topology(mesh), 50)
        # Same operation order -> agreement at machine level.
        assert np.allclose(sm_native.coords, sm_python.coords, atol=1e-13, rtol=0)

    def test_speedup(self, ys930_path):
        import time

        mesh = read_xdmf(ys930_path)
        t0 = time.time()
        smooth(mesh, 50, use_native=True)
        t_native = time.time() - t0
        assert t_native < 0.5  # python takes ~2 s


class TestNativeDelaunay:
    def test_matches_scipy_on_random_points(self):
        from scipy.spatial import Delaunay

        rng = np.random.default_rng(0)
        pts = rng.uniform(size=(400, 2))
        ours = native.delaunay_native(pts)
        ref = Delaunay(pts)
        # Same triangle SET (orientation/order may differ).
        ours_set = {tuple(sorted(t)) for t in ours}
        ref_set = {tuple(sorted(t)) for t in ref.simplices}
        # Allow a tiny disagreement on co-circular slivers.
        sym_diff = ours_set ^ ref_set
        assert len(sym_diff) <= max(2, len(ref_set) // 200), (
            f"{len(sym_diff)} differing triangles of {len(ref_set)}"
        )

    def test_matches_scipy_on_mesh_points(self, ys930_path):
        from scipy.spatial import Delaunay

        mesh = read_xdmf(ys930_path)
        pts = mesh.coords
        ours = native.delaunay_native(pts)
        ref = Delaunay(pts)
        ours_set = {tuple(sorted(t)) for t in ours}
        ref_set = {tuple(sorted(t)) for t in ref.simplices}
        sym_diff = ours_set ^ ref_set
        assert len(sym_diff) <= max(2, len(ref_set) // 200)

    def test_valid_triangulation_properties(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(size=(200, 2))
        tris = native.delaunay_native(pts)
        m = TriMesh(coords=pts, cells=tris)
        # Covers the convex hull area.
        from scipy.spatial import ConvexHull

        hull_area = ConvexHull(pts).volume
        assert np.isclose(m.cell_volumes().sum(), hull_area, rtol=1e-9)
        # Nondegenerate: every triangle has strictly positive area (thin
        # slivers along the hull are legitimate Delaunay output).
        assert m.cell_volumes().min() > 0


class TestNativePolylineDistance:
    def test_matches_numpy_formula(self):
        """Native kernel == the NumPy broadcast fallback (same formula)."""
        from meshdqn_tpu.native import polyline_distance_native

        rng = np.random.default_rng(7)
        pts = rng.standard_normal((500, 2))
        ring = rng.standard_normal((80, 2))
        a, b = ring, np.roll(ring, -1, axis=0)
        ab = b - a
        ab2 = np.maximum((ab * ab).sum(axis=1), 1e-300)
        ap = pts[:, None, :] - a[None]
        t = np.clip((ap * ab[None]).sum(axis=2) / ab2[None], 0.0, 1.0)
        proj = a[None] + t[..., None] * ab[None]
        d_np = np.linalg.norm(pts[:, None, :] - proj, axis=2).min(axis=1)
        d_nat = polyline_distance_native(pts, ring)
        assert np.allclose(d_np, d_nat, rtol=0, atol=1e-12)
        # Ordering (what the N-closest window consumes) is preserved.
        assert np.array_equal(np.argsort(d_np), np.argsort(d_nat))

    def test_point_on_segment_is_zero(self):
        from meshdqn_tpu.native import polyline_distance_native

        ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        pts = np.array([[0.5, 0.0], [2.0, 0.5], [0.5, 0.5]])
        d = polyline_distance_native(pts, ring)
        assert abs(d[0]) < 1e-15
        assert abs(d[1] - 1.0) < 1e-15
        assert abs(d[2] - 0.5) < 1e-15


def test_smooth_cells_native_bit_parity():
    """The topology-building native smoother must match the NumPy-prep +
    smooth_native path to the last bit (same ascending neighbour order,
    same Gauss-Seidel sweep)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from meshdqn_tpu.mesh import read_xdmf
    from meshdqn_tpu.mesh.smooth import _star_topology
    from meshdqn_tpu.native import smooth_cells_native, smooth_native

    mesh = read_xdmf("/root/reference/xdmf_files/ys930_0.15000_triangle.xdmf")
    topo = _star_topology(mesh)
    ref = smooth_native(mesh.coords, *topo, 50)
    got = smooth_cells_native(mesh.coords, mesh.cells, mesh.boundary_vertex_mask, 50)
    assert np.array_equal(ref, got)
