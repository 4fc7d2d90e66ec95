"""IPCS solver tests.

Golden values come from this framework's own verified f64 run, which
matched the reference CSV at 5000 steps to 3.6e-8 (drag) / 3.0e-7 (lift)
relative — see BASELINE.md and the stage-1 gate commit.  Short-horizon
goldens guard against regressions without paying the 10-minute full solve;
the full gate runs under `-m slow`.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from meshdqn_tpu.mesh import read_xdmf, smooth
from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

# f64 trajectory values at steps 200 / 500 (1-indexed count of evolve steps)
GOLD_DRAG_200 = -0.13741777684382556
GOLD_DRAG_500 = -0.10715710994402826
GOLD_LIFT_500 = -0.11007160584889464

# Reference CSV endpoints (training_results/benchmark_results/*.csv)
REF = {
    "ys930_0.15000": (-0.1130622, -0.0462851),
    "ah93w145_0.14000": (-0.1302693, -0.0504921),
}


@pytest.fixture(scope="module")
def ys930_mesh(ys930_path):
    return smooth(read_xdmf(ys930_path), 50)


@pytest.fixture(scope="module")
def solver64(ys930_mesh):
    return IPCSSolver(ys930_mesh, IPCSConfig(precision="f64"))


class TestF64Regression:
    def test_drag_trajectory_golden(self, solver64):
        st = solver64.initial_state()
        st, d, l = solver64.evolve(st, 500)
        assert np.isclose(float(d[199]), GOLD_DRAG_200, rtol=1e-10)
        assert np.isclose(float(d[499]), GOLD_DRAG_500, rtol=1e-10)
        assert np.isclose(float(l[499]), GOLD_LIFT_500, rtol=1e-9)

    def test_determinism(self, solver64):
        st1, d1, _ = solver64.evolve(solver64.initial_state(), 50)
        st2, d2, _ = solver64.evolve(solver64.initial_state(), 50)
        assert np.array_equal(np.asarray(d1), np.asarray(d2))

    def test_velocity_respects_bcs(self, solver64, ys930_mesh):
        st, _, _ = solver64.evolve(solver64.initial_state(), 100)
        u = np.asarray(st.u)
        ops = solver64.operators
        # Dirichlet dofs hold their values exactly after every step.
        bc = ops.u_bc_mask
        assert np.allclose(u[bc], ops.u_bc_values[bc], atol=1e-12)
        # Inflow max = 1.5 (Um), field bounded by a modest transient factor.
        assert np.abs(u).max() < 3.0


class TestNewtonSchulzInverse:
    """_ns_inverse replaces the LU custom-call in the on-device composition
    (solver/fused.py): pure-matmul executable, same f32 terminal accuracy."""

    def test_matches_lu_inverse_spd_mass_like(self):
        from meshdqn_tpu.solver.fused import _ns_inverse

        rng = np.random.default_rng(0)
        n = 300
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        # kappa ~ 50: the mass-dominated velocity systems' regime
        A = (Q * np.geomspace(1.0, 50.0, n)) @ Q.T
        X = np.asarray(_ns_inverse(jnp.asarray(A, jnp.float32), 20))
        err = np.linalg.norm(np.eye(n) - A @ X) / np.linalg.norm(np.eye(n))
        lu = np.linalg.inv(A.astype(np.float32))
        err_lu = np.linalg.norm(np.eye(n) - A @ lu)
        assert err < max(10 * err_lu, 1e-4), (err, err_lu)

    def test_graded_mass_matrix_needs_jacobi_scaling(self):
        """The on-hardware failure mode: FEM mass matrices on graded meshes
        carry an h^2 diagonal spread (plus unit BC rows) that makes the raw
        kappa huge; _ns_inverse's symmetric Jacobi scaling removes it."""
        from meshdqn_tpu.solver.fused import _ns_inverse

        rng = np.random.default_rng(3)
        n = 400
        # well-conditioned core scaled by a 1e3 diagonal spread (area
        # grading) with a few unit rows (BC pins)
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        core = (Q * np.geomspace(1.0, 30.0, n)) @ Q.T
        d = np.geomspace(1.0, 1e3, n)
        rng.shuffle(d)
        A = d[:, None] * core * d[None, :]
        A[:5] = 0.0; A[:, :5] = 0.0; A[:5, :5] = np.eye(5)  # BC rows
        X = np.asarray(_ns_inverse(jnp.asarray(A, jnp.float32), 24))
        err = np.linalg.norm(np.eye(n) - A @ X, ord=2)
        assert err < 1e-2, err

    def test_converges_poisson_conditioning(self):
        from meshdqn_tpu.solver.fused import _ns_inverse

        rng = np.random.default_rng(1)
        n = 300
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        # kappa = 1e4: the pressure Poisson block's regime (dense-path cap)
        A = (Q * np.geomspace(1.0, 1e4, n)) @ Q.T
        X = np.asarray(_ns_inverse(jnp.asarray(A, jnp.float32), 40))
        err = np.linalg.norm(np.eye(n) - A @ X, ord=2)
        # terminal ~kappa*eps_f32 ~ 6e-4; refinement contracts by this
        # factor per sweep, so <1e-2 is ample for 4 sweeps to ~1e-12.
        assert err < 1e-2, err

    def test_refined_solve_ns_matches_exact(self):
        from meshdqn_tpu.solver.fused import _refined_solve

        rng = np.random.default_rng(2)
        n = 200
        Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        A = (Q * np.geomspace(1.0, 2e3, n)) @ Q.T
        B = rng.standard_normal((n, 8))
        X_exact = np.linalg.solve(A, B)
        X = np.asarray(
            _refined_solve(
                jnp.asarray(A, jnp.float64), jnp.asarray(B, jnp.float64),
                iters=4, chunk=8, inv_iters=40,
            )
        )
        rel = np.abs(X - X_exact).max() / np.abs(X_exact).max()
        assert rel < 1e-9, rel


class TestPrecisionModes:
    def test_f32_tracks_f64_short_horizon(self, ys930_mesh, solver64):
        s32 = IPCSSolver(ys930_mesh, IPCSConfig(precision="f32"))
        st64, d64, _ = solver64.evolve(solver64.initial_state(), 200)
        st32, d32, _ = s32.evolve(s32.initial_state(), 200)
        assert np.asarray(d32).dtype == np.float32
        rel = abs(float(d64[-1]) - float(d32[-1])) / abs(float(d64[-1]))
        # Fast transient at step 200; observed ~1e-5..2e-4 (fused f32).
        # Full-horizon accuracy is gated separately (drag 6e-5 at step 5000).
        assert rel < 5e-4

    def test_mixed_pressure_is_f64(self, ys930_mesh):
        sm = IPCSSolver(ys930_mesh, IPCSConfig(precision="mixed", refine_iters=1))
        st = sm.initial_state()
        assert st.u.dtype == np.float32
        assert st.p.dtype == np.float64
        st, d, l = sm.evolve(st, 50)
        assert np.isfinite(np.asarray(d)).all()


@pytest.mark.slow
class TestFullGate:
    """The SURVEY.md stage-1 gate: full 5000-step solve vs reference CSV."""

    @pytest.mark.parametrize("name", ["ys930_0.15000", "ah93w145_0.14000"])
    def test_drag_lift_match_reference(self, name):
        mesh = smooth(
            read_xdmf(f"/root/reference/xdmf_files/{name}_triangle.xdmf"), 50
        )
        solver = IPCSSolver(mesh, IPCSConfig(precision="f64"))
        out = solver.solve(5000, save_steps=1000)
        gt_d, gt_l = REF[name]
        d = float(out["snap_drags"][-1])
        l = float(out["snap_lifts"][-1])
        assert abs((d - gt_d) / gt_d) < 1e-3
        assert abs((l - gt_l) / gt_l) < 1e-3


class TestDf32:
    """Split-operator (f32 hi + bf16 lo) fused path — 'df32' precision.

    Measured on v5e (5000-step CSV gates): lift rel err improves ~3-4x over
    pure f32 at ~1.3x the step cost; see solver/fused.py fused_step_df32."""

    @pytest.mark.slow
    def test_split_limbs_reconstruct_f64_operators(self, ys930_mesh):
        sd = IPCSSolver(ys930_mesh, IPCSConfig(precision="df32"))
        s32 = IPCSSolver(ys930_mesh, IPCSConfig(precision="f32"))
        assert sd.dev_lo is not None
        # hi limbs ARE the f32 build (same correctly-rounded operators)
        np.testing.assert_array_equal(
            np.asarray(sd.dev.F1u), np.asarray(s32.dev.F1u)
        )
        # hi + lo reconstructs the exact operator ~250x better than f32
        # alone: the residual after subtracting both limbs is bounded by
        # the bf16 rounding of the low limb (~0.4% of 2^-24 relative).
        F1u64 = np.asarray(sd.dev.F1u, np.float64) + np.asarray(
            sd.dev_lo.F1u, np.float64
        )
        scale = np.abs(np.asarray(s32.dev.F1u, np.float64)) + 1e-30
        # |exact - (hi+lo)| <= 2^-8 * |lo| <= 2^-8 * 2^-24 |hi| ~ 2.3e-10
        assert sd.dev_lo.F1u.dtype == jnp.bfloat16
        lo_resid = np.abs(np.asarray(sd.dev_lo.F1u, np.float64)) / scale
        assert np.nanmax(lo_resid) < 1.2 * 2.0**-24

    @pytest.mark.slow
    def test_df32_tracks_f64_tighter_than_f32(self, ys930_mesh, solver64):
        sd = IPCSSolver(ys930_mesh, IPCSConfig(precision="df32"))
        st64, d64, l64 = solver64.evolve(solver64.initial_state(), 200)
        std, dd, ld = sd.evolve(sd.initial_state(), 200)
        assert np.asarray(dd).dtype == np.float32
        rel = abs(float(d64[-1]) - float(dd[-1])) / abs(float(d64[-1]))
        assert np.isfinite(np.asarray(dd)).all()
        assert rel < 5e-4


class TestPadQuantum:
    @pytest.mark.slow
    def test_padded_solver_matches_unpadded(self, ys930_mesh):
        """Shape-quantized padding (zero embed + unit pad diagonal) is
        mathematically exact: pad state entries stay zero and drag/lift
        track the unpadded fused solve inside the f32 trajectory noise
        band (the padded composition rounds differently in the last ulp)."""
        s0 = IPCSSolver(ys930_mesh, IPCSConfig(precision="f32", fused=True))
        sq = IPCSSolver(
            ys930_mesh, IPCSConfig(precision="f32", fused=True, pad_quantum=512)
        )
        assert sq.ndofs_u % 1024 == 0 and sq.ndofs_u > s0.ndofs_u
        _, d0, l0 = s0.evolve(s0.initial_state(), 200)
        st, dq, lq = sq.evolve(sq.initial_state(), 200)
        assert abs(float(d0[-1]) - float(dq[-1])) / abs(float(d0[-1])) < 1e-3
        # padded dof blocks stay exactly zero through the recursion
        ns, nsq, npp, nppq = sq._pad
        u = np.asarray(st.u)
        assert np.all(u[ns:nsq] == 0) and np.all(u[nsq + ns :] == 0)
        assert np.all(np.asarray(st.p)[npp:] == 0)
        # unpad round-trip has the true layout
        uu = np.asarray(sq.unpad_u(st.u))
        assert uu.shape == (s0.ndofs_u,)
        np.testing.assert_array_equal(uu[:ns], u[:ns])
