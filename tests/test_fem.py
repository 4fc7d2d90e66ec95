import numpy as np
import pytest

from meshdqn_tpu.fem import (
    P1Space,
    P2Space,
    VectorP2Space,
    assemble_operators,
    apply_bc_symmetric,
    dunavant_6,
    gauss_legendre_1d,
    p1_basis,
    p1_grads,
    p2_basis,
    p2_grads,
)
from meshdqn_tpu.mesh import TriMesh, mark_boundaries, read_xdmf
from meshdqn_tpu.mesh.marking import BoundaryMarkers
from meshdqn_tpu.probes import drag_probe, lift_probe, assemble_force_probe

from tests.meshes import unit_square_mesh


def _analytic_tri_moment(a, b):
    """Integral of x^a y^b over the unit reference triangle = a! b! / (a+b+2)!."""
    from math import factorial

    return factorial(a) * factorial(b) / factorial(a + b + 2)


def _null_markers(mesh):
    F = len(mesh.boundary_facets)
    return BoundaryMarkers(
        markers=np.full(F, 4, dtype=np.int32),
        hits={k: np.zeros(F, dtype=bool) for k in range(4)},
    )


class TestQuadrature:
    def test_dunavant_degree6_exact(self):
        pts, w = dunavant_6()
        for a in range(7):
            for b in range(7 - a):
                approx = np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b)
                assert np.isclose(approx, _analytic_tri_moment(a, b), atol=1e-15), (a, b)

    def test_gauss_1d(self):
        t, w = gauss_legendre_1d(3)
        for k in range(6):  # exact to degree 5
            assert np.isclose(np.sum(w * t**k), 1.0 / (k + 1), atol=1e-15)


class TestShapeFunctions:
    def test_partition_of_unity(self):
        pts, _ = dunavant_6()
        assert np.allclose(p1_basis(pts).sum(axis=1), 1.0)
        assert np.allclose(p2_basis(pts).sum(axis=1), 1.0)
        assert np.allclose(p2_grads(pts).sum(axis=1), 0.0, atol=1e-14)
        assert np.allclose(p1_grads().sum(axis=0), 0.0)

    def test_p2_nodal_property(self):
        # phi_i(x_j) = delta_ij at the 6 nodes (3 vertices, 3 edge midpoints
        # with edge i opposite vertex i).
        nodes = np.array(
            [[0, 0], [1, 0], [0, 1], [0.5, 0.5], [0, 0.5], [0.5, 0]], dtype=float
        )
        assert np.allclose(p2_basis(nodes), np.eye(6), atol=1e-14)

    def test_p2_gradient_finite_difference(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0.05, 0.4, size=(5, 2))
        h = 1e-7
        g = p2_grads(pts)
        for d in range(2):
            dp = pts.copy()
            dp[:, d] += h
            dm = pts.copy()
            dm[:, d] -= h
            fd = (p2_basis(dp) - p2_basis(dm)) / (2 * h)
            assert np.allclose(g[:, :, d], fd, atol=1e-6)


class TestOperators:
    @pytest.fixture(scope="class")
    def square_ops(self):
        mesh = unit_square_mesh(4)
        return mesh, assemble_operators(
            mesh, _null_markers(mesh), mu=1.0, rho=1.0, dt=0.1,
            inflow_profile=lambda y: 0 * y,
        )

    def test_mass_total(self, square_ops):
        mesh, ops = square_ops
        ones = np.ones(ops.V.ndofs)
        assert np.isclose(ones @ ops.M @ ones, 2.0)  # 2 components x area 1

    def test_viscous_rigid_motions_in_kernel(self, square_ops):
        mesh, ops = square_ops
        Ns = ops.V.scalar.ndofs
        dc = P2Space(mesh).dof_coords()
        const = np.concatenate([np.ones(Ns), np.full(Ns, 2.0)])
        rot = np.concatenate([-dc[:, 1], dc[:, 0]])  # eps((-y, x)) = 0
        assert np.abs(ops.Kv @ const).max() < 1e-12
        assert np.abs(ops.Kv @ rot).max() < 1e-12

    def test_pressure_stiffness_constant_nullspace(self, square_ops):
        _, ops = square_ops
        assert np.abs(ops.Kp @ np.ones(ops.Q.ndofs)).max() < 1e-12

    def test_integration_by_parts_identity(self, square_ops):
        # (grad p, v) = <p n, v> - (p, div v) holds exactly for the discrete
        # spaces with exact quadrature: G = Bn - B. Validates volume AND facet
        # assembly (orientation of n included) in one shot.
        _, ops = square_ops
        assert abs(ops.G - (ops.Bn - ops.B)).max() < 1e-13

    def test_integration_by_parts_on_airfoil_mesh(self, ys930_path):
        mesh = read_xdmf(ys930_path)
        ops = assemble_operators(
            mesh, mark_boundaries(mesh), mu=1e-3, rho=1.0, dt=1e-3
        )
        assert abs(ops.G - (ops.Bn - ops.B)).max() < 1e-13

    def test_divergence_functional(self, square_ops):
        # v = (x, 0) interpolated exactly in P2: (1, div v) = area.
        mesh, ops = square_ops
        Ns = ops.V.scalar.ndofs
        dc = P2Space(mesh).dof_coords()
        v = np.concatenate([dc[:, 0], np.zeros(Ns)])
        ones = np.ones(ops.Q.ndofs)
        assert np.isclose(v @ ops.B @ ones, 1.0)

    def test_poisson_patch(self, square_ops):
        # -lap p = 0 with p = x on the boundary has exact P1 solution p = x.
        mesh, ops = square_ops
        mask = mesh.boundary_vertex_mask
        g = np.where(mask, mesh.coords[:, 0], 0.0)
        A = apply_bc_symmetric(ops.Kp, mask).toarray()
        z = (~mask).astype(float)
        b = z * (0.0 - ops.Kp @ g) + g
        p = np.linalg.solve(A, b)
        assert np.allclose(p, mesh.coords[:, 0], atol=1e-12)


class TestBoundaryConditions:
    def test_bc_partition_ys930(self, ys930_path):
        mesh = read_xdmf(ys930_path)
        ops = assemble_operators(mesh, mark_boundaries(mesh), 1e-3, 1.0, 1e-3)
        Ns = ops.V.scalar.ndofs
        # Every boundary scalar dof is constrained for velocity (inflow, walls,
        # airfoil, and the outflow? no: outflow velocity is free).
        # Check: constrained dofs are symmetric across components.
        mx = ops.u_bc_mask[:Ns]
        my = ops.u_bc_mask[Ns:]
        assert np.array_equal(mx, my)
        # Inflow x-velocity takes the parabolic profile: max ~ Um = 1.5 at y=0.
        vals = ops.u_bc_values[:Ns]
        assert np.isclose(vals.max(), 1.5, atol=1e-2)
        assert ops.u_bc_values[Ns:].max() == 0.0
        # Pressure pinned only at outflow vertices.
        out_x = mesh.coords[ops.p_bc_mask, 0]
        assert np.all(out_x > 3.0 - 1e-9)


class TestProbes:
    def test_pressure_only_drag_closed_contour(self, ys930_path):
        # u=0, p=const: drag = -p * closed-contour integral of n_x = 0.
        mesh = read_xdmf(ys930_path)
        markers = mark_boundaries(mesh)
        probe = drag_probe(mesh, markers, mu=1e-3)
        d = probe.sample(np.zeros(VectorP2Space(mesh).ndofs), np.ones(mesh.num_vertices))
        assert abs(d) < 1e-13

    def test_pressure_field_drag_equals_hole_area(self, ys930_path):
        # p = x, u = 0: drag = -int x n_x ds = -area(airfoil) by divergence
        # theorem (n points out of the fluid = into the hole).
        mesh = read_xdmf(ys930_path)
        markers = mark_boundaries(mesh)
        probe = drag_probe(mesh, markers, mu=1e-3)
        d = probe.sample(
            np.zeros(VectorP2Space(mesh).ndofs), mesh.coords[:, 0].copy()
        )
        # Shoelace area of the airfoil ring (facet polygon).
        from meshdqn_tpu.mesh import airfoil_polyline

        ring = airfoil_polyline(mesh)
        x, y = ring[:, 0], ring[:, 1]
        area = 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        assert np.isclose(abs(d), area, rtol=1e-12)

    def test_viscous_drag_shear_field(self, ys930_path):
        # u = (y^2, 0) (exactly representable in P2), p = 0:
        # (sigma n).e_x = 2 mu y n_y -> drag = 2 mu * hole area (divergence
        # theorem applied to the field (0, y) on the hole).
        mesh = read_xdmf(ys930_path)
        markers = mark_boundaries(mesh)
        mu = 0.7
        probe = drag_probe(mesh, markers, mu=mu)
        dc = P2Space(mesh).dof_coords()
        u = np.concatenate([dc[:, 1] ** 2, np.zeros_like(dc[:, 1])])
        d = probe.sample(u, np.zeros(mesh.num_vertices))
        from meshdqn_tpu.mesh import airfoil_polyline

        ring = airfoil_polyline(mesh)
        x, y = ring[:, 0], ring[:, 1]
        area = 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        assert np.isclose(abs(d), 2 * mu * area, rtol=1e-12)

    def test_lift_is_drag_rotated(self, ys930_path):
        mesh = read_xdmf(ys930_path)
        markers = mark_boundaries(mesh)
        # For p-only fields: lift(p) = -int p n_y; with p = y gives hole area.
        probe = lift_probe(mesh, markers, mu=1e-3)
        l = probe.sample(
            np.zeros(VectorP2Space(mesh).ndofs), mesh.coords[:, 1].copy()
        )
        from meshdqn_tpu.mesh import airfoil_polyline

        ring = airfoil_polyline(mesh)
        x, y = ring[:, 0], ring[:, 1]
        area = 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        assert np.isclose(abs(l), area, rtol=1e-12)


class TestBCEquivalence:
    def test_symmetric_vs_row_elimination_same_solution(self, ys930_path):
        # Symmetric elimination (SystemAssembler-style) and naive row
        # replacement must produce the same solution; validates the
        # b~ = Z(b - A g) + g RHS map used per step by the solver.
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        mesh = read_xdmf(ys930_path)
        ops = assemble_operators(mesh, mark_boundaries(mesh), 1e-3, 1.0, 1e-3)
        A = ops.A2
        mask = ops.p_bc_mask
        g = np.where(mask, 0.7, 0.0)  # nonzero BC values to stress the map
        rng = np.random.default_rng(0)
        b = rng.standard_normal(A.shape[0])

        # Row elimination
        Arow = A.tolil()
        for i in np.flatnonzero(mask):
            Arow.rows[i] = [i]
            Arow.data[i] = [1.0]
        x_row = spla.spsolve(Arow.tocsr(), np.where(mask, g, b))

        # Symmetric elimination + RHS map
        Asym = apply_bc_symmetric(A, mask)
        z = (~mask).astype(float)
        b_sym = z * (b - A @ g) + g
        x_sym = spla.spsolve(Asym.tocsr(), b_sym)

        assert np.allclose(x_row, x_sym, atol=1e-10)
        assert np.allclose(x_sym[mask], g[mask], atol=1e-12)


class TestPenetratedProbes:
    """Penetrated-surface force probes (reference probes.py:64-100):
    F = int (-rho (u.n) u + sigma.n) . e ds — the momentum-flux term is
    quadratic in u; validate it against an independent per-edge Gauss
    quadrature of the known affine field."""

    def _mesh(self):
        # A square strictly inside the channel box so ALL its boundary
        # facets satisfy the reference's airfoil predicate.
        from tests.meshes import unit_square_mesh

        m = unit_square_mesh(4)
        coords = m.coords.copy()
        coords[:, 0] = 0.8 * coords[:, 0]           # x in [0, 0.8]
        coords[:, 1] = 0.8 * coords[:, 1] - 0.4     # y in [-0.4, 0.4]
        return m.with_coords(coords)

    def test_momentum_flux_vs_quadrature_oracle(self):
        import numpy as np

        from meshdqn_tpu.fem.spaces import P1Space, VectorP2Space
        from meshdqn_tpu.mesh import mark_boundaries
        from meshdqn_tpu.probes import drag_probe, penetrated_drag_probe

        mesh = self._mesh()
        markers = mark_boundaries(mesh)
        mu, rho = 1e-3, 1.3

        def uf(x, y):  # affine -> exactly representable in P2
            return np.stack([0.3 + 1.1 * x - 0.4 * y, -0.2 + 0.5 * x + 0.9 * y], -1)

        Vs = VectorP2Space(mesh).scalar
        pts = Vs.dof_coords()
        vals = uf(pts[:, 0], pts[:, 1])
        u = np.concatenate([vals[:, 0], vals[:, 1]])
        p = 0.7 * np.ones(P1Space(mesh).ndofs)

        pen = penetrated_drag_probe(mesh, markers, mu, rho)
        base = drag_probe(mesh, markers, mu)

        # Independent oracle: 5-pt Gauss per boundary facet on the exact u.
        xg, wg = np.polynomial.legendre.leggauss(5)
        flux = 0.0
        normals = mesh.facet_normals()
        for f in range(len(mesh.boundary_facets)):
            a, b = mesh.coords[mesh.boundary_facets[f]]
            n = normals[f]
            L = np.linalg.norm(b - a)
            for t, w in zip(0.5 * (xg + 1.0), 0.5 * wg * L):
                x, y = a + t * (b - a)
                uv = uf(x, y)
                flux += w * (uv @ n) * uv[0]  # e = (1, 0)
        expected = base.sample(u, p) - rho * flux
        got = pen.sample(u, p)
        assert abs(got - expected) < 1e-12 * max(1.0, abs(expected))

    def test_flux_vanishes_for_constant_field(self):
        # For u = const, int (u.n)(u.e) ds over a CLOSED boundary is
        # (u.e) u . oint n ds = 0, so penetrated == plain probe.
        import numpy as np

        from meshdqn_tpu.fem.spaces import P1Space, VectorP2Space
        from meshdqn_tpu.mesh import mark_boundaries
        from meshdqn_tpu.probes import lift_probe, penetrated_lift_probe

        mesh = self._mesh()
        markers = mark_boundaries(mesh)
        ns = VectorP2Space(mesh).scalar.ndofs
        u = np.concatenate([np.full(ns, 1.7), np.full(ns, -0.6)])
        p = np.zeros(P1Space(mesh).ndofs)
        pen = penetrated_lift_probe(mesh, markers, 1e-3, 1.0)
        plain = lift_probe(mesh, markers, 1e-3)
        assert abs(pen.sample(u, p) - plain.sample(u, p)) < 1e-13
