"""Large-mesh CG solver path (IPCSConfig.method='cg', ops/cg.py).

The dense invert-once operators cap out in HBM near 1600 vertices; the CG
path keeps the velocity systems sparse (warm-started Jacobi-PCG) so the
reference's finest sweep rows (3395 verts, smooth_ys930_…csv:2) fit one
chip.  Gates: PCG solves an SPD system to roundoff, and the CG stepper
tracks the dense f64 oracle on the stock mesh.
"""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from meshdqn_tpu.mesh import read_xdmf, smooth
from meshdqn_tpu.ops.cg import jacobi_inv, pcg
from meshdqn_tpu.ops.sparse import EllMatrix
from meshdqn_tpu.solver import IPCSConfig, IPCSSolver


@pytest.fixture(scope="module")
def ys930_mesh(ys930_path):
    return smooth(read_xdmf(ys930_path), 50)


class TestPCG:
    def _spd(self, n=80, seed=0):
        rng = np.random.default_rng(seed)
        # mass-like SPD matrix: banded, diagonally dominant
        d = 2.0 + rng.random(n)
        off = 0.3 * rng.random(n - 1)
        A = sp.diags([off, d, off], [-1, 0, 1]).tocsr()
        return A

    def test_solves_spd_to_roundoff(self):
        A = self._spd()
        rng = np.random.default_rng(1)
        B = rng.standard_normal((A.shape[0], 2))
        Aell = EllMatrix.from_scipy(A, dtype=jnp.float64)
        X = pcg(Aell, jacobi_inv(Aell), jnp.asarray(B),
                jnp.zeros_like(jnp.asarray(B)), iters=60)
        ref = np.linalg.solve(A.toarray(), B)
        assert np.allclose(np.asarray(X), ref, rtol=1e-10, atol=1e-12)

    def test_converged_system_stays_finite(self):
        # once the residual is zero, further iterations must not NaN
        A = self._spd(20)
        Aell = EllMatrix.from_scipy(A, dtype=jnp.float64)
        b = jnp.ones((20, 1), dtype=jnp.float64)
        X = pcg(Aell, jacobi_inv(Aell), b, jnp.zeros((20, 1)), iters=500)
        assert np.all(np.isfinite(np.asarray(X)))
        assert np.allclose(np.asarray(Aell @ X[:, 0]), 1.0, atol=1e-12)

    def test_warm_start_exact_solution_is_fixed_point(self):
        A = self._spd(50)
        Aell = EllMatrix.from_scipy(A, dtype=jnp.float64)
        x = np.linalg.solve(A.toarray(), np.ones(50))
        X = pcg(Aell, jacobi_inv(Aell), jnp.ones((50, 1)),
                jnp.asarray(x)[:, None], iters=3)
        assert np.allclose(np.asarray(X)[:, 0], x, rtol=1e-12)


class TestBlockJacobi:
    def _banded_spd(self, n=96, w=6, seed=0):
        rng = np.random.default_rng(seed)
        # banded SPD with meaningful off-diagonal coupling (so pointwise
        # Jacobi is a visibly weaker preconditioner than block inverses)
        B = sp.random(n, n, density=0.0, format="lil")
        for k in range(1, w + 1):
            off = 0.4 * rng.random(n - k) / k
            B += sp.diags([off, off], [-k, k])
        A = (B + B.T) * 0.5 + sp.diags(3.0 + rng.random(n))
        return A.tocsr()

    def test_apply_matches_blockdiag_inverse(self):
        from meshdqn_tpu.ops.cg import block_jacobi_inv

        A = self._banded_spd(100)  # non-multiple of nb: exercises padding
        bj = block_jacobi_inv(A, nb=32, dtype=jnp.float64)
        R = np.random.default_rng(2).standard_normal((100, 3))
        got = np.asarray(bj.apply(jnp.asarray(R)))
        # explicit block-diagonal inverse
        M = np.zeros((100, 100))
        for lo in range(0, 100, 32):
            hi = min(lo + 32, 100)
            M[lo:hi, lo:hi] = np.linalg.inv(A[lo:hi, lo:hi].todense())
        assert np.allclose(got, M @ R, rtol=1e-12, atol=1e-12)

    def test_block_pcg_solves_and_beats_jacobi(self):
        from meshdqn_tpu.ops.cg import block_jacobi_inv

        A = self._banded_spd(96)
        Aell = EllMatrix.from_scipy(A, dtype=jnp.float64)
        b = np.random.default_rng(3).standard_normal((96, 1))
        ref = np.linalg.solve(A.toarray(), b)
        bj = block_jacobi_inv(A, nb=32, dtype=jnp.float64)
        # correctness at convergence
        Xb = pcg(Aell, bj, jnp.asarray(b), jnp.zeros((96, 1)), iters=60)
        assert np.allclose(np.asarray(Xb), ref, rtol=1e-9, atol=1e-11)
        # strictly better residual than pointwise Jacobi at a small
        # fixed iteration count (the production regime: fixed-iter PCG)
        it = 4
        Xj = pcg(Aell, jacobi_inv(Aell), jnp.asarray(b),
                 jnp.zeros((96, 1)), iters=it)
        Xb4 = pcg(Aell, bj, jnp.asarray(b), jnp.zeros((96, 1)), iters=it)
        rj = np.linalg.norm(A @ np.asarray(Xj) - b)
        rb = np.linalg.norm(A @ np.asarray(Xb4) - b)
        assert rb < rj

    @pytest.mark.slow
    def test_solver_block_precond_matches_jacobi_drag(self, ys930_mesh):
        """cg_precond='block' changes only the preconditioner — at
        convergence-level iteration counts the drag must match the
        Jacobi-PCG path to f64 tightness."""
        a = IPCSSolver(ys930_mesh, IPCSConfig(precision="f64", method="cg"))
        st, da, _ = a.evolve(a.initial_state(), 100)
        b = IPCSSolver(
            ys930_mesh,
            IPCSConfig(precision="f64", method="cg", cg_precond="block"),
        )
        st2, db, _ = b.evolve(b.initial_state(), 100)
        assert np.isclose(float(db[-1]), float(da[-1]), rtol=1e-9)


class TestCGStepper:
    def test_cg_f64_matches_dense_f64_short(self, ys930_mesh):
        """Fast-suite CG gate: 30 steps vs the dense invert-once oracle.
        The 300-step version below is the slow-suite gate."""
        dense = IPCSSolver(ys930_mesh, IPCSConfig(precision="f64"))
        st, d1, l1 = dense.evolve(dense.initial_state(), 30)
        cg = IPCSSolver(ys930_mesh, IPCSConfig(precision="f64", method="cg"))
        st2, d2, l2 = cg.evolve(cg.initial_state(), 30)
        assert np.isclose(float(d2[-1]), float(d1[-1]), rtol=1e-8)
        assert np.isclose(float(l2[-1]), float(l1[-1]), rtol=1e-7)

    @pytest.mark.slow
    def test_cg_f64_matches_dense_f64(self, ys930_mesh):
        """300 steps on the stock mesh: the CG path must track the dense
        invert-once oracle to near-roundoff (same discretization, same
        dtype — only the linear solves differ)."""
        dense = IPCSSolver(ys930_mesh, IPCSConfig(precision="f64"))
        st, d1, l1 = dense.evolve(dense.initial_state(), 300)
        cg = IPCSSolver(ys930_mesh, IPCSConfig(precision="f64", method="cg"))
        st2, d2, l2 = cg.evolve(cg.initial_state(), 300)
        assert np.isclose(float(d2[-1]), float(d1[-1]), rtol=1e-8)
        assert np.isclose(float(l2[-1]), float(l1[-1]), rtol=1e-7)

    @pytest.mark.slow
    def test_cg_warm_start_carries_across_evolve_calls(self, ys930_mesh):
        cg = IPCSSolver(ys930_mesh, IPCSConfig(precision="f64", method="cg"))
        st = cg.initial_state()
        st, da, _ = cg.evolve(st, 50)
        st, db, _ = cg.evolve(st, 50)
        cg2 = IPCSSolver(ys930_mesh, IPCSConfig(precision="f64", method="cg"))
        st1, d100, _ = cg2.evolve(cg2.initial_state(), 100)
        assert np.isclose(float(db[-1]), float(d100[-1]), rtol=1e-9)

    @pytest.mark.slow
    def test_cg_chunked_evolve_bit_matches_unchunked(self, ys930_mesh):
        """cg_chunk bounds the per-call scan length (the remote TPU worker
        crashes on >=100-step CG scans at finest-row sizes) — splitting
        must be EXACTLY the same computation: same per-step ops, carried
        state and warm start."""
        a = IPCSSolver(ys930_mesh, IPCSConfig(precision="f64", method="cg"))
        st, da, la = a.evolve(a.initial_state(), 60)
        b = IPCSSolver(
            ys930_mesh, IPCSConfig(precision="f64", method="cg", cg_chunk=25)
        )
        st2, db, lb = b.evolve(b.initial_state(), 60)
        assert np.array_equal(np.asarray(da), np.asarray(db))
        assert np.array_equal(np.asarray(la), np.asarray(lb))
        assert np.array_equal(np.asarray(st.u), np.asarray(st2.u))
