import numpy as np
import pytest

from meshdqn_tpu.coarsen import RemovalStatus, remove_vertex
from meshdqn_tpu.fem.spaces import P2Space, VectorP2Space
from meshdqn_tpu.mesh import TriMesh, read_xdmf, smooth
from meshdqn_tpu.transfer import (
    SnapshotSet,
    SnapshotTransfer,
    SourceField,
    eval_p1,
    eval_p2_vector,
    locate,
)

from tests.meshes import unit_square_mesh


class TestPointLocation:
    def test_locate_inside(self):
        m = unit_square_mesh(4)
        src = SourceField.build(m)
        rng = np.random.default_rng(0)
        pts = rng.uniform(0.01, 0.99, size=(50, 2))
        cells, xi = locate(src, pts)
        cells = np.asarray(cells)
        xi = np.asarray(xi)
        # Reconstruct physical coordinates from (cell, xi): must match.
        p = m.coords[m.cells[cells]]
        rec = (
            p[:, 0]
            + xi[:, :1] * (p[:, 1] - p[:, 0])
            + xi[:, 1:] * (p[:, 2] - p[:, 0])
        )
        assert np.allclose(rec, pts, atol=1e-12)
        # Inside the containing cell: barycentric coords nonnegative.
        assert (xi >= -1e-12).all()
        assert ((xi.sum(axis=1)) <= 1 + 1e-12).all()

    def test_locate_extrapolation_outside(self):
        m = unit_square_mesh(2)
        src = SourceField.build(m)
        pts = np.array([[1.3, 0.5], [-0.2, -0.2]])
        cells, xi = locate(src, pts)
        # Best cell must be one adjacent to the nearest boundary.
        p = m.coords[m.cells[np.asarray(cells)]]
        rec = (
            p[:, 0]
            + np.asarray(xi)[:, :1] * (p[:, 1] - p[:, 0])
            + np.asarray(xi)[:, 1:] * (p[:, 2] - p[:, 0])
        )
        # Extrapolated evaluation still reconstructs the physical point.
        assert np.allclose(rec, pts, atol=1e-12)


class TestInterpolationExactness:
    def test_p2_exact_for_quadratics(self):
        # P2 interpolation reproduces any quadratic exactly, including
        # extrapolation outside the source mesh.
        m = unit_square_mesh(3)
        src = SourceField.build(m)
        dc = P2Space(m).dof_coords()
        f = lambda x, y: 1.0 + 2 * x - y + 3 * x * y + x**2 - 0.5 * y**2
        g = lambda x, y: -2.0 + x + 4 * y - x * y + 0.25 * x**2
        u = np.concatenate([f(dc[:, 0], dc[:, 1]), g(dc[:, 0], dc[:, 1])])
        pts = np.array([[0.333, 0.77], [0.01, 0.99], [1.15, 0.5], [-0.1, 0.42]])
        vals = np.asarray(eval_p2_vector(src, u, pts))
        assert np.allclose(vals[:, 0], f(pts[:, 0], pts[:, 1]), atol=1e-12)
        assert np.allclose(vals[:, 1], g(pts[:, 0], pts[:, 1]), atol=1e-12)

    def test_p1_exact_for_linears(self):
        m = unit_square_mesh(3)
        src = SourceField.build(m)
        f = lambda x, y: 0.5 - x + 2 * y
        p = f(m.coords[:, 0], m.coords[:, 1])
        pts = np.array([[0.2, 0.9], [0.5, 0.5], [1.2, -0.1]])
        vals = np.asarray(eval_p1(src, p, pts))
        assert np.allclose(vals, f(pts[:, 0], pts[:, 1]), atol=1e-12)

    def test_same_mesh_roundtrip_identity(self, ys930_path):
        # Interpolating onto the same mesh must reproduce dofs exactly
        # (SURVEY.md build-plan gate for stage 2).
        mesh = read_xdmf(ys930_path)
        rng = np.random.default_rng(1)
        Ns = P2Space(mesh).ndofs
        u = rng.standard_normal(2 * Ns)
        p = rng.standard_normal(mesh.num_vertices)
        tr = SnapshotTransfer(mesh, SnapshotSet(u=u[None], p=p[None]))
        out = tr.to_mesh(mesh)
        assert np.allclose(out.u[0], u, atol=1e-9)
        assert np.allclose(out.p[0], p, atol=1e-10)


class TestVertexRemoval:
    def test_remove_interior_vertex_ys930(self, ys930_path):
        mesh = smooth(read_xdmf(ys930_path), 50)
        removable = ~mesh.boundary_vertex_mask
        v = int(np.flatnonzero(removable)[10])
        res = remove_vertex(mesh, v)
        assert res.status == RemovalStatus.OK
        assert res.mesh.num_vertices == mesh.num_vertices - 1
        # Airfoil hole preserved: Euler characteristic still 0 (annulus).
        m2 = res.mesh
        assert m2.num_vertices - m2.num_edges + m2.num_cells == 0
        # Same boundary vertex count (interior removal).
        assert len(m2.boundary_vertices()) == len(mesh.boundary_vertices())

    def test_remove_boundary_vertex_rejected(self, ys930_path):
        mesh = smooth(read_xdmf(ys930_path), 50)
        v = int(mesh.boundary_vertices()[0])
        res = remove_vertex(mesh, v)
        assert res.status == RemovalStatus.BROKE_MESH

    def test_sequential_removals(self, ys930_path):
        mesh = smooth(read_xdmf(ys930_path), 50)
        rng = np.random.default_rng(7)
        ok = 0
        for _ in range(20):
            removable = np.flatnonzero(~mesh.boundary_vertex_mask)
            v = int(rng.choice(removable))
            res = remove_vertex(mesh, v)
            if res.status == RemovalStatus.OK:
                mesh = res.mesh
                ok += 1
        assert ok >= 15  # most interior removals succeed
        assert mesh.cell_volumes().min() > 0

    def test_transfer_after_removal(self, ys930_path):
        # Interpolate a quadratic across a removal: still exact (the field is
        # globally quadratic so re-evaluation anywhere is exact).
        mesh = smooth(read_xdmf(ys930_path), 50)
        dc = P2Space(mesh).dof_coords()
        f = lambda x, y: 1 + x + y + x * y
        u = np.concatenate([f(dc[:, 0], dc[:, 1]), 0 * dc[:, 0]])
        p = mesh.coords[:, 0] * 2.0
        tr = SnapshotTransfer(mesh, SnapshotSet(u=u[None], p=p[None]))
        v = int(np.flatnonzero(~mesh.boundary_vertex_mask)[0])
        res = remove_vertex(mesh, v)
        assert res.status == RemovalStatus.OK
        out = tr.to_mesh(res.mesh)
        dc2 = P2Space(res.mesh).dof_coords()
        Ns2 = P2Space(res.mesh).ndofs
        assert np.allclose(out.u[0][:Ns2], f(dc2[:, 0], dc2[:, 1]), atol=1e-10)
        assert np.allclose(out.p[0], res.mesh.coords[:, 0] * 2.0, atol=1e-10)
