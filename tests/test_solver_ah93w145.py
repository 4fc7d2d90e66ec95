"""Fast (500-step) golden-trajectory gates for the SECOND airfoil.

test_solver.py carries the ys930 goldens; without these, ah93w145's solve
was only guarded by the -m slow 5000-step CSV gates and could silently
regress between slow-gate runs.  Goldens computed with the f64 unfused
path on this repo (mesh: /root/reference/xdmf_files/
ah93w145_0.14000_triangle.xdmf, smooth(50), reference flow params
configs/ray_ah93w145.yaml:2-10).
"""
import numpy as np
import pytest

from meshdqn_tpu.mesh import read_xdmf, smooth
from meshdqn_tpu.solver import IPCSConfig, IPCSSolver

AH_GOLD_DRAG_200 = -0.1568032724241405
AH_GOLD_LIFT_200 = -0.13983305907815272
AH_GOLD_DRAG_500 = -0.12266197385617193
AH_GOLD_LIFT_500 = -0.16465381880581467


@pytest.fixture(scope="module")
def ah_mesh(ah93w145_path):
    return smooth(read_xdmf(ah93w145_path), 50)


@pytest.fixture(scope="module")
def ah_traj64(ah_mesh):
    s = IPCSSolver(ah_mesh, IPCSConfig(precision="f64"))
    st, d, l = s.evolve(s.initial_state(), 500)
    return np.asarray(d), np.asarray(l)


class TestAh93w145FastGates:
    def test_f64_golden_trajectory(self, ah_traj64):
        d, l = ah_traj64
        assert np.isclose(d[199], AH_GOLD_DRAG_200, rtol=1e-10)
        assert np.isclose(l[199], AH_GOLD_LIFT_200, rtol=1e-9)
        assert np.isclose(d[499], AH_GOLD_DRAG_500, rtol=1e-10)
        assert np.isclose(l[499], AH_GOLD_LIFT_500, rtol=1e-9)

    def test_f32_fused_tracks_f64(self, ah_mesh, ah_traj64):
        """The TPU production path, on the CPU backend: fused f32 with
        host-composed operators must track the f64 oracle at 500 steps
        (mirrors test_solver.py's ys930 f32 gate)."""
        s = IPCSSolver(
            ah_mesh,
            IPCSConfig(precision="f32", fused=True, compose_on_host=True),
        )
        st, d, l = s.evolve(s.initial_state(), 500)
        rel = abs(float(d[499]) - ah_traj64[0][499]) / abs(ah_traj64[0][499])
        assert rel < 2e-3

    @pytest.mark.slow
    def test_cg_banded_tracks_f64(self, ah_mesh, ah_traj64):
        """The large-mesh CG path (banded layout) against the dense f64
        oracle — measured 1.1e-12 rel at 500 steps; gate at 1e-9."""
        s = IPCSSolver(ah_mesh, IPCSConfig(precision="f64", method="cg"))
        assert type(s.dev).__name__ == "BandedCGOperators"
        st, d, l = s.evolve(s.initial_state(), 500)
        rel = abs(float(d[499]) - ah_traj64[0][499]) / abs(ah_traj64[0][499])
        assert rel < 1e-9
