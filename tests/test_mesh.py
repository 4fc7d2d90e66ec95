import numpy as np
import pytest

from tests.meshes import unit_square_mesh
from meshdqn_tpu.mesh import (
    AIRFOIL,
    INFLOW,
    OUTFLOW,
    WALLS,
    TriMesh,
    airfoil_polyline,
    mark_boundaries,
    read_xdmf,
    smooth,
    write_xdmf,
)


class TestTopology:
    def test_euler_formula_square(self):
        m = unit_square_mesh(4)
        # V - E + C = 1 for a disk
        assert m.num_vertices - m.num_edges + m.num_cells == 1
        assert len(m.boundary_facets) == 4 * 4
        assert np.isclose(m.cell_volumes().sum(), 1.0)

    def test_ys930_counts(self, ys930_path):
        m = read_xdmf(ys930_path)
        # Reference mesh: 876 vertices / 1570 cells (SURVEY.md layer L7).
        assert m.num_vertices == 876
        assert m.num_cells == 1570
        assert m.num_edges == 2446
        # One hole (airfoil): V - E + C = 0
        assert m.num_vertices - m.num_edges + m.num_cells == 0
        assert len(m.boundary_vertices()) == 182

    def test_facet_normals_outward(self):
        m = unit_square_mesh(2)
        n = m.facet_normals()
        mids = 0.5 * (
            m.coords[m.boundary_facets[:, 0]] + m.coords[m.boundary_facets[:, 1]]
        )
        # Outward normal at the midpoint moves the point out of [0,1]^2.
        outside = mids + 1e-3 * n
        out_of_box = (
            (outside[:, 0] < 0)
            | (outside[:, 0] > 1)
            | (outside[:, 1] < 0)
            | (outside[:, 1] > 1)
        )
        assert out_of_box.all()

    def test_normals_integrate_to_zero_on_closed_boundary(self, ys930_path):
        # Divergence theorem: integral of n over the full closed boundary = 0.
        m = read_xdmf(ys930_path)
        n = m.facet_normals()
        lengths = m.facet_lengths()
        total = (n * lengths[:, None]).sum(axis=0)
        assert np.allclose(total, 0.0, atol=1e-12)


class TestXdmfRoundtrip:
    def test_roundtrip(self, ys930_path, tmp_path):
        m = read_xdmf(ys930_path)
        out = tmp_path / "m.xdmf"
        write_xdmf(str(out), m)
        m2 = read_xdmf(str(out))
        assert np.array_equal(m.coords, m2.coords)
        assert np.array_equal(m.cells, m2.cells)


class TestMarking:
    def test_ys930_marking_partition(self, ys930_path):
        m = read_xdmf(ys930_path)
        bm = mark_boundaries(m)
        counts = {tag: int((bm.markers == tag).sum()) for tag in range(5)}
        # Every boundary facet must be classified (no leftovers at tag 4).
        assert counts[4] == 0
        # Airfoil ring has 120 vertices -> 120 facets.
        assert counts[AIRFOIL] == 120
        assert counts[INFLOW] > 0 and counts[OUTFLOW] > 0 and counts[WALLS] > 0
        assert sum(counts.values()) == len(m.boundary_facets)

    def test_airfoil_polyline_ordered_ring(self, ys930_path):
        m = read_xdmf(ys930_path)
        ring = airfoil_polyline(m)
        assert len(ring) == 120
        # Consecutive vertices are mesh-edge neighbours: short hops only.
        d = np.linalg.norm(np.diff(ring, axis=0), axis=1)
        assert d.max() < 0.05


class TestSmoothing:
    def test_boundary_fixed_interior_moves(self, ys930_path):
        m = read_xdmf(ys930_path)
        sm = smooth(m, 5)
        bmask = m.boundary_vertex_mask
        assert np.array_equal(m.coords[bmask], sm.coords[bmask])
        assert not np.allclose(m.coords[~bmask], sm.coords[~bmask])

    def test_no_inverted_cells_after_smoothing(self, ys930_path):
        m = read_xdmf(ys930_path)
        sm = smooth(m, 50)
        assert sm.cell_volumes().min() > 0
        # Quality should not degrade to degenerate.
        assert sm.min_cell_quality() > 0.05

    def test_smooth_improves_quality(self):
        # Perturb interior of a structured mesh; smoothing should help.
        m = unit_square_mesh(6)
        rng = np.random.default_rng(0)
        coords = m.coords.copy()
        interior = ~m.boundary_vertex_mask
        coords[interior] += rng.uniform(-0.04, 0.04, size=(interior.sum(), 2))
        rough = TriMesh(coords=coords, cells=m.cells)
        sm = smooth(rough, 50)
        assert sm.min_cell_quality() > rough.min_cell_quality()


class TestGeneratedMesh:
    """Resolution-parameterized channel meshes (mesh/generate.py) — the
    generator behind scripts/resolution_sweep.py's regenerated benchmark
    CSVs (reference benchmark_results/*.csv, resolutions 0.05-0.3)."""

    def test_generated_mesh_valid_and_marked(self, ys930_path):
        from meshdqn_tpu.mesh import read_xdmf, mark_boundaries
        from meshdqn_tpu.mesh.marking import airfoil_polyline
        from meshdqn_tpu.mesh.generate import generate_channel_mesh

        ring = airfoil_polyline(read_xdmf(ys930_path))
        mesh = generate_channel_mesh(ring, 0.25)
        # valid triangulation: positive areas, no orphan vertices
        import numpy as np

        tri = mesh.coords[mesh.cells]
        areas = 0.5 * np.abs(
            (tri[:, 1, 0] - tri[:, 0, 0]) * (tri[:, 2, 1] - tri[:, 0, 1])
            - (tri[:, 2, 0] - tri[:, 0, 0]) * (tri[:, 1, 1] - tri[:, 0, 1])
        )
        assert (areas > 1e-12).all()
        assert np.unique(mesh.cells).size == mesh.num_vertices
        # airfoil / inflow / outflow facets all present (hole carved,
        # channel walls are tag 0 = WALLS)
        from meshdqn_tpu.mesh.marking import AIRFOIL, INFLOW, OUTFLOW

        m = mark_boundaries(mesh)
        present = set(np.unique(m.markers[m.markers > 0]))
        assert {AIRFOIL, INFLOW, OUTFLOW} <= present

    def test_vertex_count_tracks_resolution(self, ys930_path):
        from meshdqn_tpu.mesh import read_xdmf
        from meshdqn_tpu.mesh.marking import airfoil_polyline
        from meshdqn_tpu.mesh.generate import generate_channel_mesh

        ring = airfoil_polyline(read_xdmf(ys930_path))
        coarse = generate_channel_mesh(ring, 0.3)
        fine = generate_channel_mesh(ring, 0.18)
        assert coarse.num_vertices < fine.num_vertices
        # reference CSV: 467 verts at resolution 0.30; the generator
        # tracks the reference curve within ~15%
        assert 400 <= coarse.num_vertices <= 540

    def test_verbatim_ring_preserved_and_counts_track_reference(
        self, ys930_path
    ):
        """Default ring_mode='verbatim' keeps the geometry polygon EXACTLY
        (the reference sweep reused one fixed airfoil polygon across all
        resolutions — its LE/TE point clustering is part of the geometry;
        losing it biased drag by ~5% at resolution 0.15)."""
        import numpy as np

        from meshdqn_tpu.mesh import read_xdmf
        from meshdqn_tpu.mesh.marking import airfoil_polyline
        from meshdqn_tpu.mesh.generate import generate_channel_mesh

        ring = airfoil_polyline(read_xdmf(ys930_path))
        for res in (0.25, 0.15):
            mesh = generate_channel_mesh(ring, res)
            # ring vertices lead the coordinate array, in order, verbatim
            np.testing.assert_allclose(mesh.coords[: len(ring)], ring)
            recovered = airfoil_polyline(mesh)
            assert len(recovered) == len(ring)
        # reference CSV row at the stock resolution: 876 verts @ 0.15
        assert abs(mesh.num_vertices - 876) / 876 < 0.15
        # spline mode (legacy) resamples the ring uniformly instead
        spl = generate_channel_mesh(ring, 0.15, ring_mode="spline")
        seg = np.linalg.norm(
            np.diff(spl.coords[:100], axis=0), axis=1
        )
        assert seg.std() / seg.mean() < 0.25  # ~uniform spacing

    def test_in_ring_includes_every_ring_vertex_region(self):
        """Path(ring, closed=True) silently drops the LAST vertex's
        coordinates (CLOSEPOLY consumes them); _in_ring must classify
        points near EVERY ring vertex correctly (review fix)."""
        import numpy as np

        from meshdqn_tpu.mesh.generate import _in_ring

        # Square whose last vertex (0,1) is the one Path(closed=True)
        # would drop, turning the region into a triangle.
        ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        pts = np.array([
            [0.15, 0.8],   # inside the square, OUTSIDE the dropped-vertex triangle
            [0.5, 0.5],    # well inside
            [-0.1, 0.5],   # outside
            [0.5, 1.1],    # outside
        ])
        inside = _in_ring(pts, ring)
        assert inside.tolist() == [True, True, False, False]
