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
