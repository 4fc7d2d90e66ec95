import jax
import numpy as np
import pytest

from meshdqn_tpu.models import init_params
from meshdqn_tpu.parallel import make_dp_train_step, make_mesh, replicate, shard_batch
from meshdqn_tpu.rl import DQNConfig, ReplayBuffer, init_dqn, train_step

from tests.test_models_rl import make_graph


def _filled_buffer(n=40):
    buf = ReplayBuffer(capacity=64, n_nodes=12, n_features=17, edge_budget=16)
    for i in range(n):
        g = make_graph(12, 12, [(0, 1), (2, 3)], seed=i, e_pad=16)
        g2 = make_graph(12, 12, [(1, 2)], seed=i + 500, e_pad=16)
        buf.push(g, i % 7, g2 if i % 4 else None, float(np.sin(i)))
    return buf


class TestDataParallel:
    def test_eight_device_mesh(self):
        mesh = make_mesh(8)
        assert mesh.devices.size == 8

    def test_dp_step_runs_and_matches_single_device(self):
        # The sharded step on 8 virtual devices must agree with the
        # single-device train_step (same batch, same params).
        cfg = DQNConfig(lr=1e-3, target_update=10, topk=0.1)
        p1 = init_params(jax.random.PRNGKey(0), 17, 8, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 8, conv_width=8, topk=0.1)

        buf = _filled_buffer()
        rng = np.random.default_rng(0)
        batch = buf.sample(16, rng)  # 16 = 2 per device on 8 devices

        ref_state, ref_loss = train_step(init_dqn(p1, p2, cfg), batch, cfg)

        mesh = make_mesh(8)
        dp_step = make_dp_train_step(mesh, cfg)
        state0 = replicate(mesh, init_dqn(p1, p2, cfg))
        sbatch = shard_batch(mesh, batch)
        dp_state, dp_loss = dp_step(state0, sbatch)

        assert np.isclose(float(dp_loss), float(ref_loss), rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_state.params1),
            jax.tree_util.tree_leaves(dp_state.params1),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_dp_multiple_steps_select_toggles(self):
        cfg = DQNConfig(lr=1e-3, target_update=2, topk=0.1)
        p1 = init_params(jax.random.PRNGKey(2), 17, 8, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(3), 17, 8, conv_width=8, topk=0.1)
        mesh = make_mesh(8)
        dp_step = make_dp_train_step(mesh, cfg)
        state = replicate(mesh, init_dqn(p1, p2, cfg))
        buf = _filled_buffer()
        rng = np.random.default_rng(1)
        selects = []
        for _ in range(4):
            state, _ = dp_step(state, shard_batch(mesh, buf.sample(8, rng)))
            selects.append(bool(state.select))
        assert selects == [True, False, False, True]
