import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from meshdqn_tpu.ops.sparse import EllMatrix
from meshdqn_tpu.utils import Config, Timer, force_sync
from meshdqn_tpu.utils.config import _coerce


class TestConfig:
    def test_reference_yaml_loads_unchanged(self):
        # The reference's own config file parses with identical values.
        cfg = Config.from_yaml("/root/reference/configs/ray_ys930.yaml")
        assert cfg.flow.mu == 1e-3
        assert cfg.flow.dt == 1e-3
        assert cfg.flow.smooth is True
        assert cfg.agent.N_closest == 180
        assert cfg.agent.solver_steps == 5000
        assert cfg.agent.goal_vertices == 0.95
        assert cfg.optimizer.lr == 1e-5
        assert cfg.optimizer.batch_size == 32
        assert cfg.epsilon.gamma == 1.0

    def test_override_coercion(self):
        cfg = Config.from_yaml("configs/ys930.yaml")
        cfg.apply_overrides(
            ["optimizer.lr=3e-4", "agent.timesteps=50", "flow.smooth=false",
             "agent.terminal_penalty=true"]
        )
        assert cfg.optimizer.lr == 3e-4
        assert cfg.agent.timesteps == 50
        assert cfg.flow.smooth is False
        assert cfg.agent.terminal_penalty is True

    def test_roundtrip_yaml(self, tmp_path):
        cfg = Config.from_yaml("configs/ys930.yaml")
        cfg.to_yaml(str(tmp_path / "c.yaml"))
        import yaml

        raw = yaml.safe_load(open(tmp_path / "c.yaml"))
        assert raw["flow"]["mu"] == 1e-3

    def test_coerce_string_scientific_int(self):
        assert _coerce("1e4", 5) == 10000
        assert _coerce("true", False) is True
        assert _coerce(3, 1.0) == 3.0


class TestEllMatrix:
    def test_matches_scipy_various_shapes(self):
        rng = np.random.default_rng(0)
        for R, C, density in [(50, 70, 0.1), (128, 128, 0.02), (7, 300, 0.3)]:
            A = sp.random(R, C, density=density, random_state=R, format="csr")
            ell = EllMatrix.from_scipy(A)
            x = rng.standard_normal(C)
            np.testing.assert_allclose(np.asarray(ell @ jnp.asarray(x)), A @ x,
                                       atol=1e-12)

    def test_empty_rows(self):
        A = sp.csr_matrix((4, 4))
        A[0, 1] = 2.0
        ell = EllMatrix.from_scipy(A.tocsr())
        y = np.asarray(ell @ jnp.ones(4))
        np.testing.assert_allclose(y, [2.0, 0, 0, 0])

    def test_pytree_roundtrip(self):
        import jax

        A = sp.random(10, 10, density=0.3, random_state=1, format="csr")
        ell = EllMatrix.from_scipy(A)
        leaves, treedef = jax.tree_util.tree_flatten(ell)
        ell2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert ell2.shape == ell.shape


class TestProfiling:
    def test_timer_accumulates(self):
        t = Timer()
        with t("a"):
            pass
        with t("a"):
            pass
        with t("b"):
            pass
        assert t.counts["a"] == 2 and t.counts["b"] == 1
        assert "a" in t.report()
        d = t.as_dict()
        assert d["a"]["count"] == 2

    def test_force_sync_returns_scalar(self):
        x = jnp.ones((3, 3))
        assert force_sync(x) == 1.0
        assert force_sync({"k": x * 2}) == 2.0


class TestJsonLogger:
    def test_log_and_read_roundtrip(self, tmp_path):
        import numpy as np

        from meshdqn_tpu.utils import JsonLogger, read_jsonl

        p = str(tmp_path / "log.jsonl")
        log = JsonLogger(p)
        log.log("episode", episode=1, reward=-1.5)
        log.log("episode", episode=2, reward=np.float32(0.25))  # numpy scalar
        log.close()
        recs = read_jsonl(p)
        assert [r["event"] for r in recs] == ["episode", "episode"]
        assert recs[1]["reward"] == 0.25
        assert all("ts" in r for r in recs)

    def test_append_across_instances(self, tmp_path):
        from meshdqn_tpu.utils import JsonLogger, read_jsonl

        p = str(tmp_path / "log.jsonl")
        JsonLogger(p).log("a")
        JsonLogger(p).log("b")
        assert [r["event"] for r in read_jsonl(p)] == ["a", "b"]
