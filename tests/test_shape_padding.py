"""Exactness of the r5 shape-stability padding primitives.

Deploy re-simulations reuse compiled modules across one-vertex removals
only if EVERY input shape is stable within a pad_quantum bucket; r5 added
COO-nnz quantization (solver/fused._coo64) and convection cell-count
quantization (ops/convection.ConvectionKernel.build cells_pad).  Both must
be mathematically exact: zero COO entries are no-ops under the scatter-add
densify, and wdet=0 pad cells contribute exactly zero.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from meshdqn_tpu.mesh import read_xdmf, smooth
from meshdqn_tpu.ops.convection import ConvectionKernel
from meshdqn_tpu.solver.fused import _coo64, _dense64

from tests.conftest import REFERENCE_DIR


@pytest.fixture(scope="module")
def ys930_mesh():
    return smooth(
        read_xdmf(str(REFERENCE_DIR / "xdmf_files" / "ys930_0.15000_triangle.xdmf")),
        50,
    )


class TestCooNnzPadding:
    def test_padded_densify_is_exact(self):
        rng = np.random.default_rng(0)
        A = sp.random(37, 41, density=0.2, random_state=0, format="coo")
        dense0 = np.asarray(_dense64(_coo64(A), (37, 41)))
        for q in (8, 64, 1000):
            coo = _coo64(A, q)
            assert len(coo[2]) % q == 0 and len(coo[2]) >= A.nnz
            np.testing.assert_array_equal(
                np.asarray(_dense64(coo, (37, 41))), dense0
            )

    def test_shapes_stable_across_nnz(self):
        A = sp.random(50, 50, density=0.1, random_state=1, format="coo")
        B = sp.random(50, 50, density=0.11, random_state=2, format="coo")
        qa, qb = _coo64(A, 4096), _coo64(B, 4096)
        assert qa[2].shape == qb[2].shape  # same bucket -> same program

    def test_no_pad_entry_at_origin_corrupts(self):
        # A matrix with a genuine entry at (0, 0): padding must add 0.0
        # there, not overwrite.
        A = sp.coo_matrix(([3.5], ([0], [0])), shape=(4, 4))
        d = np.asarray(_dense64(_coo64(A, 16), (4, 4)))
        assert d[0, 0] == 3.5 and d.sum() == 3.5


class TestConvectionCellsPadding:
    def test_padded_kernel_matches_unpadded(self, ys930_mesh):
        k0 = ConvectionKernel.build(ys930_mesh, dtype=jnp.float64)
        kp = ConvectionKernel.build(ys930_mesh, dtype=jnp.float64, cells_pad=256)
        C = ys930_mesh.num_cells
        assert kp.cell_dofs.shape[0] % 256 == 0
        assert kp.cell_dofs.shape[0] >= C
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.standard_normal(k0.ndofs))
        r0 = np.asarray(k0(u))
        rp = np.asarray(kp(u))
        np.testing.assert_allclose(rp, r0, rtol=0, atol=1e-12)

    def test_pad_cells_have_zero_weight(self, ys930_mesh):
        kp = ConvectionKernel.build(ys930_mesh, dtype=jnp.float64, cells_pad=256)
        C = ys930_mesh.num_cells
        assert np.all(np.asarray(kp.wdet)[C:] == 0.0)

    def test_composes_with_ns_pad(self, ys930_mesh):
        # cells_pad + ns_pad (the deploy re-sim configuration).
        k0 = ConvectionKernel.build(ys930_mesh, dtype=jnp.float64)
        ns = k0.ndofs // 2
        nsq = -(-ns // 128) * 128
        kq = ConvectionKernel.build(
            ys930_mesh, dtype=jnp.float64, ns_pad=nsq, cells_pad=256
        )
        rng = np.random.default_rng(4)
        u = rng.standard_normal(k0.ndofs)
        uq = np.zeros(2 * nsq)
        uq[:ns] = u[:ns]
        uq[nsq : nsq + ns] = u[ns:]
        r0 = np.asarray(k0(jnp.asarray(u)))
        rq = np.asarray(kq(jnp.asarray(uq)))
        np.testing.assert_allclose(rq[:ns], r0[:ns], atol=1e-12)
        np.testing.assert_allclose(rq[nsq : nsq + ns], r0[ns:], atol=1e-12)
        assert np.all(rq[ns:nsq] == 0) and np.all(rq[nsq + ns :] == 0)
