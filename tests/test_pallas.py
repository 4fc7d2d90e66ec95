import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from meshdqn_tpu.ops.pallas_kernels import ell_matvec_pallas
from meshdqn_tpu.ops.sparse import EllMatrix


class TestPallasEllMatvec:
    def _random_ell(self, R, C, density, seed):
        rng = np.random.default_rng(seed)
        A = sp.random(R, C, density=density, random_state=seed, format="csr")
        ell = EllMatrix.from_scipy(A, dtype=jnp.float32)
        x = rng.standard_normal(C).astype(np.float32)
        return A, ell, x

    @pytest.mark.parametrize("R,C", [(100, 80), (512, 512), (777, 333)])
    def test_matches_scipy(self, R, C):
        A, ell, x = self._random_ell(R, C, 0.05, seed=R)
        y = np.asarray(
            ell_matvec_pallas(ell.cols, ell.vals, jnp.asarray(x),
                              block_rows=128, interpret=True)
        )
        ref = A @ x
        assert np.allclose(y, ref, atol=1e-5)

    def test_matches_xla_formulation_on_fem_operator(self, ys930_path):
        from meshdqn_tpu.fem import assemble_operators
        from meshdqn_tpu.mesh import mark_boundaries, read_xdmf

        mesh = read_xdmf(ys930_path)
        ops = assemble_operators(mesh, mark_boundaries(mesh), 1e-3, 1.0, 1e-3)
        ell = EllMatrix.from_scipy(ops.Kp, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(ops.Kp.shape[1]).astype(np.float32))
        y_pallas = np.asarray(
            ell_matvec_pallas(ell.cols, ell.vals, x, interpret=True)
        )
        y_xla = np.asarray(ell @ x)
        assert np.allclose(y_pallas, y_xla, atol=1e-5)

    def test_non_divisible_block(self):
        A, ell, x = self._random_ell(130, 64, 0.1, seed=7)
        y = np.asarray(
            ell_matvec_pallas(ell.cols, ell.vals, jnp.asarray(x),
                              block_rows=64, interpret=True)
        )
        assert np.allclose(y, A @ x, atol=1e-5)


class TestMatvecPallas:
    """Blocked dense matvec kernels (interpret mode; the same kernels are
    hardware-validated on v5e — see ops/pallas_kernels.py module notes and
    docs/PALLAS.md for the measured numbers)."""

    def _mx(self, R, N, seed=0):
        rng = np.random.default_rng(seed)
        return (
            jnp.asarray(rng.standard_normal((R, N)).astype(np.float32)),
            jnp.asarray(rng.standard_normal(N).astype(np.float32)),
        )

    def test_single_matches_dense(self):
        from meshdqn_tpu.ops.pallas_kernels import matvec_pallas

        M, x = self._mx(700, 500)
        y = matvec_pallas(M, x, block_rows=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(M) @ np.asarray(x), rtol=2e-6, atol=1e-5
        )

    def test_multi_rhs(self):
        from meshdqn_tpu.ops.pallas_kernels import matvec_pallas

        rng = np.random.default_rng(3)
        M, _ = self._mx(256, 384)
        X = jnp.asarray(rng.standard_normal((384, 2)).astype(np.float32))
        Y = matvec_pallas(M, X, block_rows=64, interpret=True)
        np.testing.assert_allclose(
            np.asarray(Y), np.asarray(M) @ np.asarray(X), rtol=2e-6, atol=1e-5
        )

    def test_dual_streams_both_words(self):
        from meshdqn_tpu.ops.pallas_kernels import matvec_dual_pallas

        M, x = self._mx(512, 512, seed=1)
        lo = x * 3e-8
        y = matvec_dual_pallas(M, x, lo, block_rows=128, interpret=True)
        ref = np.asarray(M) @ np.asarray(x) + np.asarray(M) @ np.asarray(lo)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-6, atol=1e-5)


class TestBandedMatmatPallas:
    """Interpret-mode gates for the banded windowed SpMV kernel (the
    large-mesh CG hot op; ops/banded.py layout)."""

    def _banded(self, n, density=0.02, seed=1):
        import scipy.sparse as sp

        from meshdqn_tpu.ops.banded import BandedMatrix, rcm_permutation

        A = sp.random(n, n, density=density, random_state=seed, format="csr")
        A = A + A.T + sp.eye(n)
        perm = rcm_permutation(A)
        Ap = A.tocsr()[perm][:, perm].tocsr()
        return Ap, BandedMatrix.from_scipy(
            Ap, dtype=jnp.float32, device_build=False
        )

    @pytest.mark.parametrize("mr", [1, 2])
    def test_matches_scipy(self, mr):
        from meshdqn_tpu.ops.pallas_kernels import banded_matmat_pallas

        rng = np.random.default_rng(0)
        Ap, Bm = self._banded(600)
        n = Ap.shape[0]
        X = rng.standard_normal((n, mr)).astype(np.float32)
        B, R, W = Bm.blocks.shape
        L = (B + W // Bm.g - 1) * Bm.g
        Xpad = np.zeros((L, mr), np.float32)
        Xpad[Bm.pad : Bm.pad + n] = X
        Y = banded_matmat_pallas(
            Bm.blocks, jnp.asarray(Xpad), Bm.g, n, sb=4, interpret=True
        )
        ref = Ap @ X
        np.testing.assert_allclose(np.asarray(Y), ref, rtol=3e-5, atol=2e-5)

    def test_matches_xla_formulation(self):
        from meshdqn_tpu.ops.banded import banded_matmat
        from meshdqn_tpu.ops.pallas_kernels import banded_matmat_pallas

        rng = np.random.default_rng(2)
        Ap, Bm = self._banded(500, seed=3)
        n = Ap.shape[0]
        X = rng.standard_normal((n, 1)).astype(np.float32)
        B, R, W = Bm.blocks.shape
        L = (B + W // Bm.g - 1) * Bm.g
        Xpad = np.zeros((L, 1), np.float32)
        Xpad[Bm.pad : Bm.pad + n] = X
        y_pl = banded_matmat_pallas(
            Bm.blocks, jnp.asarray(Xpad), Bm.g, n, sb=8, interpret=True
        )
        y_xla = banded_matmat(Bm.blocks, jnp.asarray(X), Bm.pad, Bm.g, Bm.shape)
        np.testing.assert_allclose(
            np.asarray(y_pl), np.asarray(y_xla), rtol=3e-5, atol=2e-5
        )

    @pytest.mark.parametrize("mr", [1, 2])
    def test_aligned128_layout_matches_scipy(self, mr):
        """The lane-aligned kernel layout (x as (L/128, 128, m), per-block
        windows at 128-floors) — the TPU production path for the banded CG
        SpMV — dispatched through BandedMatrix.matmat (interpret on CPU)."""
        from meshdqn_tpu.ops.banded import BandedMatrix

        rng = np.random.default_rng(5)
        Ap, _ = self._banded(700, seed=7)
        Bm = BandedMatrix.from_scipy(
            Ap, dtype=jnp.float32, device_build=False, aligned128=True
        )
        assert Bm.aligned128
        X = rng.standard_normal((Ap.shape[1], mr)).astype(np.float32)
        Y = np.asarray(Bm.matmat(jnp.asarray(X)))
        ref = Ap @ X
        np.testing.assert_allclose(Y, ref, rtol=3e-5, atol=2e-5)

    def test_aligned128_rectangular(self):
        from meshdqn_tpu.ops.banded import BandedMatrix

        rng = np.random.default_rng(6)
        Ap, _ = self._banded(700, seed=8)
        for M in (Ap[: 700 // 2, :], Ap[:, : 700 // 2].tocsr()):
            Bm = BandedMatrix.from_scipy(
                M, dtype=jnp.float32, device_build=False, aligned128=True
            )
            X = rng.standard_normal((M.shape[1], 1)).astype(np.float32)
            Y = np.asarray(Bm.matmat(jnp.asarray(X)))
            np.testing.assert_allclose(
                Y, M @ X, rtol=3e-5, atol=2e-5
            )


class TestBandedR128Layout:
    """The round-4 TPU production layout: R=128 row-blocks + the
    q-partitioned XLA matvec (ops/banded.banded_matmat m<=32 branch).
    On CPU from_scipy defaults to R=8, so these pin R=128 explicitly —
    same algebra the formulation shoot-out validated on hardware
    (scripts/banded_formulation_bench.py: 0.33 ms vs 2.28 ms per matvec
    at the finest sweep row)."""

    def _mat(self, nr, nc, seed):
        import scipy.sparse as sp

        A = sp.random(nr, nc, density=0.03, random_state=seed, format="csr")
        return (A + sp.eye(nr, nc)).tocsr()

    @pytest.mark.parametrize("mr", [1, 2])
    def test_square_qsum_matches_scipy(self, mr):
        from meshdqn_tpu.ops.banded import BandedMatrix

        rng = np.random.default_rng(0)
        A = self._mat(700, 700, 11)
        Bm = BandedMatrix.from_scipy(
            A, dtype=jnp.float32, R=128, device_build=False, aligned128=False
        )
        assert Bm.blocks.shape[1] == 128
        # the production branch: m = W/g small enough for the q-loop
        assert Bm.blocks.shape[2] // Bm.g <= 32
        X = rng.standard_normal((700, mr)).astype(np.float32)
        Y = np.asarray(Bm.matmat(jnp.asarray(X)))
        np.testing.assert_allclose(Y, A @ X, rtol=3e-5, atol=2e-5)

    def test_rectangular_qsum(self):
        from meshdqn_tpu.ops.banded import BandedMatrix

        rng = np.random.default_rng(1)
        sq = self._mat(700, 700, 12)
        for M in (sq[:350, :], sq[:, :350].tocsr()):
            Bm = BandedMatrix.from_scipy(
                M, dtype=jnp.float32, R=128, device_build=False,
                aligned128=False,
            )
            X = rng.standard_normal((M.shape[1], 1)).astype(np.float32)
            Y = np.asarray(Bm.matmat(jnp.asarray(X)))
            np.testing.assert_allclose(Y, M @ X, rtol=3e-5, atol=2e-5)

    def test_f64_accumulation_dtype(self):
        from meshdqn_tpu.ops.banded import BandedMatrix

        A = self._mat(300, 300, 13)
        Bm = BandedMatrix.from_scipy(
            A, dtype=jnp.float64, R=128, device_build=False, aligned128=False
        )
        X = np.random.default_rng(2).standard_normal((300, 1))
        Y = np.asarray(Bm.matmat(jnp.asarray(X)))
        assert Y.dtype == np.float64
        np.testing.assert_allclose(Y, A @ X, rtol=1e-12, atol=1e-12)

    def test_pcg_with_r128_operator(self):
        """End-to-end: fixed-iteration PCG over the R=128 layout converges
        identically to the R=8 layout (same math, different tiling)."""
        import scipy.sparse as sp

        from meshdqn_tpu.ops.banded import BandedMatrix, rcm_permutation
        from meshdqn_tpu.ops.cg import pcg

        rng = np.random.default_rng(3)
        n = 500
        A = sp.random(n, n, density=0.02, random_state=4, format="csr")
        A = A @ A.T + 5 * sp.eye(n)
        perm = rcm_permutation(A)
        Ap = A.tocsr()[perm][:, perm].tocsr()
        d = jnp.asarray(1.0 / Ap.diagonal(), jnp.float32)
        b = rng.standard_normal((n, 1)).astype(np.float32)
        xs = {}
        for R in (8, 128):
            Bm = BandedMatrix.from_scipy(
                Ap, dtype=jnp.float32, R=R, device_build=False,
                aligned128=False,
            )
            xs[R] = np.asarray(
                pcg(Bm, d, jnp.asarray(b), jnp.zeros((n, 1), jnp.float32), 30)
            )
            ref = np.linalg.solve(Ap.toarray(), b)
            np.testing.assert_allclose(xs[R], ref, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(xs[8], xs[128], rtol=2e-4, atol=2e-5)
