import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meshdqn_tpu.solver import IPCSConfig, IPCSSolver
from meshdqn_tpu.solver.batch import BatchedFlows

from tests.meshes import channel_mesh


class TestBatchedFlows:
    @pytest.fixture(scope="class")
    def meshes(self):
        # Different sizes force real padding.
        return [channel_mesh(18, 6), channel_mesh(24, 8)]

    def test_matches_individual_solves(self, meshes):
        cfgs = IPCSConfig(precision="f32", fused=True)
        batched = BatchedFlows(meshes, cfgs)
        out = batched.solve(100, save_steps=50)
        assert out["drags"].shape == (2, 100)

        for i, mesh in enumerate(meshes):
            solo = IPCSSolver(mesh, IPCSConfig(precision="f32", fused=True))
            st, d, l = solo.evolve(solo.initial_state(), 100)
            # Same fused operators, zero padding exact -> near-identical,
            # including lift (sensitive to the y-component block layout).
            np.testing.assert_allclose(
                np.asarray(out["drags"][i]), np.asarray(d), rtol=0, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(out["lifts"][i]), np.asarray(l), rtol=0, atol=1e-6
            )
            # Full final state agrees on the live blocks.
            ns = mesh.num_vertices + mesh.num_edges
            ns_max = out["state"].u.shape[1] // 2
            ub = np.asarray(out["state"].u[i])
            us = np.asarray(st.u)
            np.testing.assert_allclose(ub[:ns], us[:ns], atol=1e-4)
            np.testing.assert_allclose(
                ub[ns_max : ns_max + ns], us[ns : 2 * ns], atol=1e-4
            )

    def test_padding_stays_zero(self, meshes):
        batched = BatchedFlows(meshes, IPCSConfig(precision="f32", fused=True))
        state, d, l = batched.evolve(batched.initial_state(), 20)
        # Component-blocked padded layout: [x (ns0) | 0 | y (ns0) | 0].
        ns0 = meshes[0].num_vertices + meshes[0].num_edges
        ns_max = state.u.shape[1] // 2
        u0 = np.asarray(state.u[0])
        assert np.all(u0[ns0:ns_max] == 0.0)
        assert np.all(u0[ns_max + ns0 :] == 0.0)
        assert np.isfinite(u0).all()
        assert np.abs(u0[:ns0]).max() > 0.1  # real flow in the live block

    def test_sharded_over_device_mesh(self):
        # 8 flows sharded over the 8 virtual devices: pure data parallelism.
        from meshdqn_tpu.parallel import make_mesh

        meshes = [channel_mesh(10 + 2 * i, 4) for i in range(8)]
        batched = BatchedFlows(meshes, IPCSConfig(precision="f32", fused=True))
        dmesh = make_mesh(8)
        batched.shard(dmesh)
        state, d, l = batched.evolve(batched.initial_state(), 10)
        d = np.asarray(d)
        assert d.shape == (8, 10)
        assert np.isfinite(d).all()


class TestEnsembleFlows:
    def test_amplitude_one_matches_single_solve(self):
        from meshdqn_tpu.solver.ensemble import EnsembleFlows

        mesh = channel_mesh(16, 6)
        ens = EnsembleFlows(mesh, [1.0, 0.5], IPCSConfig(precision="f32", fused=True))
        st, d, l = ens.evolve(ens.initial_state(), 100)

        solo = IPCSSolver(mesh, IPCSConfig(precision="f32", fused=True))
        sts, ds, ls = solo.evolve(solo.initial_state(), 100)
        # (channel mesh: no airfoil facets, so drag/lift are trivially zero —
        # compare the full state instead)
        np.testing.assert_allclose(
            np.asarray(st.u[:, 0]), np.asarray(sts.u), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(st.p[:, 0]), np.asarray(sts.p), atol=1e-3
        )
        # Half-amplitude member: a real, different, weaker flow.
        u0 = np.linalg.norm(np.asarray(st.u[:, 0]))
        u1 = np.linalg.norm(np.asarray(st.u[:, 1]))
        assert np.isfinite(u1) and 0.1 * u0 < u1 < 0.9 * u0

    def test_inlet_velocity_scales(self):
        from meshdqn_tpu.solver.ensemble import EnsembleFlows

        mesh = channel_mesh(16, 6)
        ens = EnsembleFlows(mesh, [1.0, 2.0], IPCSConfig(precision="f32", fused=True))
        st, _, _ = ens.evolve(ens.initial_state(), 5)
        u = np.asarray(st.u)
        ops = ens.solver.operators
        bc = ops.u_bc_mask
        # Dirichlet dofs hold amplitude-scaled profile values.
        np.testing.assert_allclose(u[bc, 0], ops.u_bc_values[bc], atol=1e-6)
        np.testing.assert_allclose(u[bc, 1], 2 * ops.u_bc_values[bc], atol=1e-5)
