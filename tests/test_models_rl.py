import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meshdqn_tpu.env.graph import GraphState
from meshdqn_tpu.models import (
    forward,
    gcn_conv,
    init_params,
    sage_conv,
    stage_sizes,
    surrogate_forward,
    surrogate_init,
    topk_init,
    topk_pool,
)
from meshdqn_tpu.rl import (
    DQNConfig,
    ReplayBuffer,
    epsilon,
    init_dqn,
    select_action,
    train_step,
)


def make_graph(n_valid, n_pad, edges, n_feat=17, seed=0, e_pad=None):
    rng = np.random.default_rng(seed)
    x = np.zeros((n_pad, n_feat), dtype=np.float32)
    x[:n_valid] = rng.standard_normal((n_valid, n_feat)).astype(np.float32)
    if e_pad is None:
        e_pad = max(len(edges), 1)
    ei = np.zeros((2, e_pad), dtype=np.int32)
    em = np.zeros(e_pad, dtype=bool)
    if edges:
        ei[:, : len(edges)] = np.array(edges, dtype=np.int32).T
        em[: len(edges)] = True
    nm = np.zeros(n_pad, dtype=bool)
    nm[:n_valid] = True
    return GraphState(
        x=jnp.asarray(x),
        edge_index=jnp.asarray(ei),
        edge_attr=jnp.zeros(e_pad, jnp.float32),
        node_mask=jnp.asarray(nm),
        edge_mask=jnp.asarray(em),
    )


class TestLayers:
    def test_sage_conv_hand_computed(self):
        # 3 nodes, edges 0->1, 2->1, 1->0 (directed).  SAGE:
        # out_i = Wl.mean_{j->i} x_j + bl + Wr.x_i
        g = make_graph(3, 3, [(0, 1), (2, 1), (1, 0)], n_feat=2, seed=1)
        params = {
            "lin_l_w": jnp.eye(2),
            "lin_l_b": jnp.zeros(2),
            "lin_r_w": 2.0 * jnp.eye(2),
        }
        out = np.asarray(sage_conv(params, g.x, g.edge_index, g.edge_mask, g.node_mask))
        x = np.asarray(g.x)
        assert np.allclose(out[0], x[1] + 2 * x[0], atol=1e-6)
        assert np.allclose(out[1], (x[0] + x[2]) / 2 + 2 * x[1], atol=1e-6)
        assert np.allclose(out[2], 2 * x[2], atol=1e-6)  # no in-edges

    def test_gcn_conv_hand_computed(self):
        # 2 nodes, single edge 0->1, identity weights.
        # deg (with self loops): d0 = 1, d1 = 2.
        # out_0 = x_0 * 1/d0 ; out_1 = x_0 /sqrt(d0 d1) + x_1 / d1
        g = make_graph(2, 2, [(0, 1)], n_feat=2, seed=2)
        params = {"w": jnp.eye(2), "b": jnp.zeros(2)}
        out = np.asarray(gcn_conv(params, g.x, g.edge_index, g.edge_mask, g.node_mask))
        x = np.asarray(g.x)
        assert np.allclose(out[0], x[0], atol=1e-6)
        assert np.allclose(out[1], x[0] / np.sqrt(2) + x[1] / 2, atol=1e-6)

    def test_topk_selects_highest_scores(self):
        g = make_graph(4, 6, [(0, 1), (1, 2), (2, 3)], n_feat=2, seed=3)
        x = jnp.asarray(
            np.array([[3, 0], [1, 0], [2, 0], [4, 0], [9, 9], [9, 9]], np.float32)
        )
        params = {"w": jnp.asarray(np.array([1.0, 0.0], np.float32))}
        pg = topk_pool(params, x, g.edge_index, g.edge_mask, g.node_mask, 0.5, 2)
        # scores = x[:,0] among valid [3,1,2,4] -> top-2 = nodes 3, 0
        assert np.asarray(pg.node_mask).sum() == 2
        kept = np.asarray(pg.x)[:, 0]
        assert np.allclose(kept, [4 * np.tanh(4.0), 3 * np.tanh(3.0)], atol=1e-5)
        # edge 2->3 had one endpoint kept only; edge filtering leaves no edges
        # except those between kept nodes (none here share an edge).
        assert np.asarray(pg.edge_mask).sum() == 0

    def test_stage_sizes_match_reference_cascade(self):
        # 180 nodes at ratio 0.1: 18 -> 2 -> 1 -> 1 (airfoilgcnn + N_closest=180)
        assert stage_sizes(180, 0.1) == [18, 2, 1, 1]


class TestNodeRemovalNet:
    def test_forward_distribution(self):
        key = jax.random.PRNGKey(0)
        params = init_params(key, in_dim=17, output_dim=181, conv_width=128, topk=0.1)
        g = make_graph(180, 180, [(i, (i + 1) % 180) for i in range(180)])
        out = np.asarray(forward(params, g, topk=0.1))
        assert out.shape == (181,)
        assert np.isfinite(out).all()
        assert np.isclose(out.sum(), 1.0, atol=1e-5)  # softmax head

    def test_padding_invariance(self):
        # Same 30 valid nodes embedded in 40-pad vs 180-pad graphs must give
        # the same output (masking correctness end to end).
        key = jax.random.PRNGKey(1)
        params = init_params(key, in_dim=17, output_dim=181, conv_width=32, topk=0.1)
        edges = [(i, (i + 3) % 30) for i in range(30)]
        g_small = make_graph(30, 40, edges, seed=11)
        g_big = make_graph(30, 180, edges, seed=11)
        out_s = np.asarray(forward(params, g_small, topk=0.1))
        out_b = np.asarray(forward(params, g_big, topk=0.1))
        assert np.allclose(out_s, out_b, atol=1e-5)

    def test_embedding_mode(self):
        key = jax.random.PRNGKey(2)
        params = init_params(key, 17, 181, conv_width=16, topk=0.1)
        g = make_graph(20, 20, [(0, 1)])
        emb = forward(params, g, topk=0.1, embedding=True)
        assert emb.shape == (32,)

    def test_surrogate_scalar(self):
        key = jax.random.PRNGKey(3)
        params = surrogate_init(key, conv_width=16)
        g = make_graph(50, 50, [(i, i + 1) for i in range(49)])
        out = surrogate_forward(params, g, topk=0.5)
        assert np.isfinite(float(out))


class TestDQN:
    def _batch(self, buf, rng):
        return buf.sample(4, rng)

    def test_train_step_updates_and_swaps(self):
        key = jax.random.PRNGKey(0)
        p1 = init_params(key, 17, 11, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        cfg = DQNConfig(lr=1e-3, target_update=3, topk=0.1)
        state = init_dqn(p1, p2, cfg)

        buf = ReplayBuffer(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
        rng = np.random.default_rng(0)
        for i in range(10):
            g = make_graph(10, 10, [(0, 1), (1, 2)], seed=i, e_pad=16)
            g2 = make_graph(10, 10, [(0, 1)], seed=i + 100, e_pad=16)
            buf.push(g, i % 11, g2 if i % 3 else None, float(i) / 10)

        losses = []
        selects = []
        for i in range(6):
            batch = buf.sample(4, rng)
            state, loss = train_step(state, batch, cfg)
            losses.append(float(loss))
            selects.append(bool(state.select))
        assert all(np.isfinite(losses))
        # select starts True, flips after 3 and 6 grad steps
        assert selects == [True, True, False, False, False, True]
        # params actually moved
        leaf0 = jax.tree_util.tree_leaves(p1)[0]
        leaf1 = jax.tree_util.tree_leaves(state.params1)[0]
        assert not np.allclose(leaf0, leaf1)

    def test_select_action_in_range(self):
        p1 = init_params(jax.random.PRNGKey(0), 17, 181, conv_width=8, topk=0.1)
        g = make_graph(180, 180, [(0, 1)])
        a = int(select_action(p1, g, topk=0.1))
        assert 0 <= a <= 180

    def test_epsilon_schedule(self):
        assert np.isclose(epsilon(0, 1.0, 0.01, 10000), 1.0)
        assert np.isclose(epsilon(1e9, 1.0, 0.01, 10000), 0.01)
        mid = epsilon(10000, 1.0, 0.01, 10000)
        assert 0.01 < mid < 1.0

    def test_linear_head_same_argmax_unbounded_values(self):
        # head='linear' returns the raw logits the softmax head normalizes:
        # identical greedy argmax, but values are no longer confined to (0,1)
        # so negative double-DQN targets are representable.
        p1 = init_params(jax.random.PRNGKey(0), 17, 181, conv_width=8, topk=0.1)
        g = make_graph(180, 180, [(0, 1), (4, 7)])
        q_soft = np.asarray(forward(p1, g, topk=0.1, head="softmax"))
        q_lin = np.asarray(forward(p1, g, topk=0.1, head="linear"))
        assert int(np.argmax(q_soft)) == int(np.argmax(q_lin))
        np.testing.assert_allclose(
            q_soft, jax.nn.softmax(jnp.asarray(q_lin)), rtol=1e-5, atol=1e-6
        )
        assert np.all(q_soft >= 0) and np.all(q_soft <= 1)
        assert q_lin.min() < 0 or q_lin.max() > 1  # unbounded head

    def test_grad_clip_bounds_update_norm(self):
        # With an absurd lr-free comparison: the clipped update of a single
        # step must correspond to a gradient of global norm <= grad_clip.
        import optax

        from meshdqn_tpu.rl.dqn import make_optimizer

        cfg_clip = DQNConfig(lr=1.0, weight_decay=0.0, grad_clip=1e-6)
        opt = make_optimizer(cfg_clip)
        params = {"w": jnp.ones((3,)) * 2.0}
        grads = {"w": jnp.asarray([1e3, -1e3, 1e3])}
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        # scale_by_adam normalizes per-coordinate, so instead verify the
        # clip transform itself saw a bounded input by checking the chain
        # without adam: clip -> decay(0) keeps global norm <= grad_clip.
        clip = optax.clip_by_global_norm(cfg_clip.grad_clip)
        cupd, _ = clip.update(grads, clip.init(params), params)
        assert float(optax.global_norm(cupd)) <= cfg_clip.grad_clip * (1 + 1e-6)
        assert all(np.isfinite(np.asarray(u)).all() for u in jax.tree_util.tree_leaves(updates))

    def test_train_step_linear_head_finite(self):
        key = jax.random.PRNGKey(0)
        p1 = init_params(key, 17, 11, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        cfg = DQNConfig(lr=1e-3, target_update=3, topk=0.1, head="linear", grad_clip=10.0)
        state = init_dqn(p1, p2, cfg)
        buf = ReplayBuffer(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
        rng = np.random.default_rng(0)
        for i in range(10):
            g = make_graph(10, 10, [(0, 1), (1, 2)], seed=i, e_pad=16)
            g2 = make_graph(10, 10, [(0, 1)], seed=i + 100, e_pad=16)
            buf.push(g, i % 11, g2 if i % 3 else None, -2.0 + float(i) / 10)
        for _ in range(4):
            batch = buf.sample(4, rng)
            state, loss = train_step(state, batch, cfg)
            assert np.isfinite(float(loss))

    def test_terminal_transitions_masked(self):
        # A terminal next-state contributes 0 to the target regardless of its
        # (zeroed) content.
        buf = ReplayBuffer(capacity=8, n_nodes=5, n_features=17, edge_budget=4)
        g = make_graph(5, 5, [(0, 1)], seed=0, e_pad=4)
        buf.push(g, 1, None, 0.5)
        batch = buf.sample(1, np.random.default_rng(0))
        assert not bool(batch.non_final[0])


class TestSurrogateTraining:
    def test_surrogate_learns_constant(self):
        # Sanity: the surrogate can fit a trivial target on fixed graphs.
        from meshdqn_tpu.models import make_surrogate_trainer

        init, step, loss_fn = make_surrogate_trainer(lr=1e-2, topk=0.5)
        params, opt_state = init(jax.random.PRNGKey(0), conv_width=8)
        gs = [make_graph(12, 12, [(0, 1), (3, 4)], seed=s, e_pad=8) for s in range(4)]
        batch = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *gs)
        targets = jnp.asarray([-0.113] * 4, jnp.float32)
        l0 = float(loss_fn(params, batch, targets))
        for _ in range(60):
            params, opt_state, loss = step(params, opt_state, batch, targets)
        assert float(loss) < 0.1 * l0


class TestTrainStepMany:
    def _setup(self):
        p1 = init_params(jax.random.PRNGKey(0), 17, 11, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        cfg = DQNConfig(lr=1e-3, target_update=3, topk=0.1)
        buf = ReplayBuffer(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
        for i in range(20):
            g = make_graph(10, 10, [(0, 1), (1, 2)], seed=i, e_pad=16)
            g2 = make_graph(10, 10, [(0, 1)], seed=i + 100, e_pad=16)
            buf.push(g, i % 11, g2 if i % 3 else None, float(i) / 10)
        return cfg, init_dqn(p1, p2, cfg), buf

    def test_scan_matches_sequential(self):
        """K scanned grad steps == K sequential train_step calls, bitwise.

        This is what lets the trainer collapse a sweep's optimize calls
        into one device round-trip without changing the learned weights."""
        from meshdqn_tpu.rl import stack_batches, train_step_many

        cfg, state0, buf = self._setup()
        K = 7  # crosses a target_update boundary (3) mid-scan
        rng = np.random.default_rng(42)
        host_batches = [buf.sample_np(4, rng) for _ in range(K)]

        seq = state0
        seq_losses = []
        for b in host_batches:
            dev = jax.tree_util.tree_map(jnp.asarray, b)
            seq, loss = train_step(seq, dev, cfg)
            seq_losses.append(float(loss))

        scanned, losses = train_step_many(state0, stack_batches(host_batches), cfg)

        np.testing.assert_array_equal(np.asarray(losses), np.asarray(seq_losses))
        assert int(scanned.num_grads) == int(seq.num_grads) == K
        assert bool(scanned.select) == bool(seq.select)
        for a, b in zip(
            jax.tree_util.tree_leaves(scanned.params1),
            jax.tree_util.tree_leaves(seq.params1),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(scanned.params2),
            jax.tree_util.tree_leaves(seq.params2),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sample_np_matches_sample(self):
        _, _, buf = self._setup()
        a = buf.sample_np(4, np.random.default_rng(7))
        b = buf.sample(4, np.random.default_rng(7))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestMilestoneMapping:
    """The reference's MultiStepLR milestones count GLOBAL gradient
    applications (airfoil_dqn.py:172-176); each of our nets carries its own
    optimizer whose count only advances while that net is online, so the
    per-net boundary sits at milestone // 2 (rl/dqn.py make_optimizer).
    These tests exercise the mapping NEAR a boundary with small milestones —
    the production boundaries (0.5M/1M/1.5M) are exact under the strict
    role alternation verified here."""

    def test_lr_drops_at_half_global_milestone(self):
        from meshdqn_tpu.rl.dqn import make_optimizer

        cfg = DQNConfig(
            lr=1.0, weight_decay=0.0, target_update=2,
            milestones=(8,), milestone_gamma=0.1,
        )
        opt = make_optimizer(cfg)
        params = {"w": jnp.zeros(())}
        st = opt.init(params)
        g = {"w": jnp.ones(())}
        mags = []
        for _ in range(8):
            upd, st = opt.update(g, st, params)
            mags.append(abs(float(upd["w"])))
        # Adam with a constant gradient normalizes to |update| = lr.  The
        # per-net boundary is milestones[0] // 2 = 4 applications; allow
        # one step of boundary-semantics slack.
        assert all(m > 0.5 for m in mags[:4]), mags
        assert all(m < 0.15 for m in mags[5:]), mags

    def test_per_net_counts_track_half_global(self):
        """Strict alternation keeps each net's application count within
        target_update of global/2 at EVERY step — the invariant that makes
        the per-net boundary equal the global milestone to within one swap
        period."""
        key = jax.random.PRNGKey(0)
        p1 = init_params(key, 17, 11, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        cfg = DQNConfig(lr=1e-3, target_update=2, topk=0.1, milestones=(8,))
        state = init_dqn(p1, p2, cfg)

        buf = ReplayBuffer(capacity=32, n_nodes=10, n_features=17, edge_budget=16)
        for i in range(10):
            gph = make_graph(10, 10, [(0, 1), (1, 2)], seed=i, e_pad=16)
            buf.push(gph, i % 11, gph if i % 3 else None, float(i) / 10)
        rng = np.random.default_rng(0)

        def adam_count(opt_state):
            return int(opt_state[1].count)

        for gs in range(1, 17):
            state, _ = train_step(state, buf.sample(4, rng), cfg)
            c1, c2 = adam_count(state.opt1), adam_count(state.opt2)
            assert c1 + c2 == gs
            assert abs(2 * c1 - gs) <= cfg.target_update, (gs, c1, c2)
            assert abs(2 * c2 - gs) <= cfg.target_update, (gs, c1, c2)


class TestDeviceReplay:
    """DeviceReplay + on-device index gather == host ReplayBuffer path,
    bitwise, while the ring has not wrapped (rl/replay.py DeviceReplay)."""

    def _fill(self, buf, n=20):
        for i in range(n):
            g = make_graph(10, 10, [(0, 1), (1, 2)], seed=i, e_pad=16)
            g2 = make_graph(10, 10, [(0, 1)], seed=i + 100, e_pad=16)
            buf.push(g, i % 11, g2 if i % 3 else None, float(i) / 10)

    def test_gather_matches_host_sampling(self):
        from meshdqn_tpu.rl import DeviceReplay, gather_batch

        host = ReplayBuffer(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
        dev = DeviceReplay(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
        self._fill(host)
        self._fill(dev)
        assert len(host) == len(dev) == 20
        idx = dev.sample_indices(4, np.random.default_rng(7))
        dev.flush()
        got = gather_batch(dev.store, jnp.asarray(idx))
        want = host.sample_np(4, np.random.default_rng(7))
        for x, y in zip(
            jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_save_load_roundtrip(self, tmp_path):
        """Both replay backends persist/restore the full ring losslessly
        (the axon-leak process-recycle path, trainer._maybe_recycle)."""
        from meshdqn_tpu.rl import DeviceReplay

        for cls in (ReplayBuffer, DeviceReplay):
            a = cls(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
            b = cls(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
            self._fill(a)
            p = str(tmp_path / f"{cls.__name__}.npz")
            a.save(p)
            assert b.load(p)
            assert len(b) == len(a)
            rng_a, rng_b = (np.random.default_rng(3) for _ in range(2))
            if cls is ReplayBuffer:
                wa = a.sample_np(4, rng_a)
                wb = b.sample_np(4, rng_b)
            else:
                from meshdqn_tpu.rl import gather_batch

                ia, ib = a.sample_indices(4, rng_a), b.sample_indices(4, rng_b)
                wa = gather_batch(a.store, jnp.asarray(ia))
                wb = gather_batch(b.store, jnp.asarray(ib))
            for x, y in zip(
                jax.tree_util.tree_leaves(wa), jax.tree_util.tree_leaves(wb)
            ):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            # budget mismatch is rejected, not silently mixed
            c = cls(capacity=100, n_nodes=12, n_features=17, edge_budget=16)
            assert not c.load(p)

    def test_train_many_idx_matches_host_path(self):
        from meshdqn_tpu.rl import (
            DeviceReplay,
            stack_batches,
            train_step_many,
            train_step_many_idx,
        )

        p1 = init_params(jax.random.PRNGKey(0), 17, 11, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        cfg = DQNConfig(lr=1e-3, target_update=3, topk=0.1)
        state0 = init_dqn(p1, p2, cfg)

        host = ReplayBuffer(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
        dev = DeviceReplay(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
        self._fill(host)
        self._fill(dev)

        K = 7
        rng_h = np.random.default_rng(42)
        rng_d = np.random.default_rng(42)
        host_batches = [host.sample_np(4, rng_h) for _ in range(K)]
        idx = np.stack([dev.sample_indices(4, rng_d) for _ in range(K)])
        dev.flush()

        want_state, want_losses = train_step_many(
            state0, stack_batches(host_batches), cfg
        )
        got_state, got_losses = train_step_many_idx(
            state0, dev.store, jnp.asarray(idx), cfg
        )
        np.testing.assert_array_equal(
            np.asarray(got_losses), np.asarray(want_losses)
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(got_state.params1),
            jax.tree_util.tree_leaves(want_state.params1),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ring_wrap_and_staged_pad(self):
        """Wrapping the ring keeps size==capacity and overwrites oldest;
        flush-padding never writes ghost rows."""
        from meshdqn_tpu.rl import DeviceReplay

        dev = DeviceReplay(capacity=8, n_nodes=10, n_features=17, edge_budget=16)
        for i in range(11):  # 11 pushes into capacity 8 -> wraps by 3
            g = make_graph(10, 10, [(0, 1)], seed=i, e_pad=16)
            dev.push(g, i, g, float(i))
        dev.flush()
        assert len(dev) == 8
        acts = np.asarray(dev.store.action)
        # Ring layout: slots [0..2] hold pushes 8..10, slots [3..7] hold 3..7.
        np.testing.assert_array_equal(acts, [8, 9, 10, 3, 4, 5, 6, 7])
        np.testing.assert_array_equal(
            np.asarray(dev.store.reward),
            np.array([8, 9, 10, 3, 4, 5, 6, 7], np.float32),
        )


class TestAnchoredDQN:
    """target_mode='copy' + double + target_clip: the round-3 stabilization
    recipe (rl/dqn.py DQNConfig) that replaces the reference's anchorless
    alternating-role swap (airfoil_dqn.py:185) in the training configs."""

    def _buf(self):
        buf = ReplayBuffer(capacity=100, n_nodes=10, n_features=17, edge_budget=16)
        for i in range(12):
            g = make_graph(10, 10, [(0, 1), (1, 2)], seed=i, e_pad=16)
            g2 = make_graph(10, 10, [(0, 1)], seed=i + 100, e_pad=16)
            buf.push(g, i % 11, g2 if i % 3 else None, float(i) / 10)
        return buf

    def test_copy_mode_init_syncs_target(self):
        p1 = init_params(jax.random.PRNGKey(0), 17, 11, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        state = init_dqn(p1, p2, DQNConfig(target_mode="copy"))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params1),
            jax.tree_util.tree_leaves(state.params2),
        ):
            assert np.array_equal(a, b)

    def test_copy_mode_freezes_then_snapshots_target(self):
        p1 = init_params(jax.random.PRNGKey(0), 17, 11, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        cfg = DQNConfig(lr=1e-3, target_update=3, topk=0.1, target_mode="copy")
        state = init_dqn(p1, p2, cfg)
        buf, rng = self._buf(), np.random.default_rng(0)

        frozen = jax.tree_util.tree_leaves(state.params2)[0].copy()
        for i in range(1, 7):
            state, loss = train_step(state, buf.sample(4, rng), cfg)
            assert np.isfinite(float(loss))
            # online always net1; select never flips in copy mode
            assert bool(state.select)
            l1 = jax.tree_util.tree_leaves(state.params1)
            l2 = jax.tree_util.tree_leaves(state.params2)
            if i % cfg.target_update == 0:
                # snapshot: target == online exactly at the copy boundary
                assert all(np.array_equal(a, b) for a, b in zip(l1, l2))
                frozen = l2[0].copy()
            else:
                # frozen between copies (and != the moving online net)
                assert np.array_equal(l2[0], frozen)

    def test_double_decouples_selection_from_evaluation(self):
        import optax

        from meshdqn_tpu.rl import dqn_loss
        from meshdqn_tpu.rl.dqn import _q_values

        p_on = init_params(jax.random.PRNGKey(0), 17, 11, conv_width=8, topk=0.1)
        p_tg = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        buf, rng = self._buf(), np.random.default_rng(0)
        batch = buf.sample(8, rng)
        base = dict(lr=1e-3, topk=0.1, head="linear", gamma=0.99)
        l_max = float(dqn_loss(p_on, p_tg, batch, DQNConfig(**base, double=False)))
        l_dbl = float(dqn_loss(p_on, p_tg, batch, DQNConfig(**base, double=True)))

        # hand-compute both targets from the raw Q tables
        q = np.asarray(_q_values(p_on, batch.state, 0.1, "linear"))
        q_sa = q[np.arange(len(q)), np.asarray(batch.action)]
        qt = np.asarray(_q_values(p_tg, batch.next_state, 0.1, "linear"))
        qo = np.asarray(_q_values(p_on, batch.next_state, 0.1, "linear"))
        nf = np.asarray(batch.non_final)
        r = np.asarray(batch.reward)
        v_max = np.where(nf, qt.max(axis=1), 0.0)
        a_star = np.argmax(qo, axis=1)  # ONLINE selects ...
        v_dbl = np.where(nf, qt[np.arange(len(qt)), a_star], 0.0)  # target evaluates

        def huber(err):
            a = np.abs(err)
            return np.mean(np.where(a <= 1.0, 0.5 * err**2, a - 0.5))

        assert np.isclose(l_max, huber(q_sa - (r + 0.99 * v_max)), rtol=1e-5)
        assert np.isclose(l_dbl, huber(q_sa - (r + 0.99 * v_dbl)), rtol=1e-5)

    def test_target_clip_bounds_targets(self):
        from meshdqn_tpu.rl import dqn_loss

        p_on = init_params(jax.random.PRNGKey(0), 17, 11, conv_width=8, topk=0.1)
        p_tg = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        # inflate the target net so raw bootstrap targets are huge
        p_big = jax.tree_util.tree_map(lambda x: x * 50.0, p_tg)
        buf, rng = self._buf(), np.random.default_rng(0)
        batch = buf.sample(8, rng)
        base = dict(topk=0.1, head="linear", gamma=0.99, huber_delta=1.0)
        l_raw = float(dqn_loss(p_on, p_big, batch, DQNConfig(**base)))
        l_clip = float(
            dqn_loss(p_on, p_big, batch, DQNConfig(**base, target_clip=50.0))
        )
        # Huber(delta=1) loss ~ |err|; clipping the target at 50 bounds the
        # per-row error by ~50 + |Q_on|, so the clipped loss is much smaller
        assert l_clip < l_raw
        assert l_clip < 50.0 + 10.0  # |Q_on| of a fresh net is O(1)

    def test_anchored_training_stays_bounded(self):
        # 60 grad steps on rewards in [-1, 1] with the full recipe: Q must
        # stay well inside the clip bound (regression for the round-2/3
        # value runaway).
        from functools import partial

        p1 = init_params(jax.random.PRNGKey(0), 17, 11, conv_width=8, topk=0.1)
        p2 = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        cfg = DQNConfig(
            lr=1e-3,
            target_update=5,
            topk=0.1,
            head="linear",
            gamma=0.99,
            grad_clip=10.0,
            target_mode="copy",
            double=True,
            target_clip=50.0,
        )
        state = init_dqn(p1, p2, cfg)
        buf, rng = self._buf(), np.random.default_rng(0)
        for _ in range(60):
            state, loss = train_step(state, buf.sample(4, rng), cfg)
        g = make_graph(10, 10, [(0, 1), (1, 2)], seed=7, e_pad=16)
        q = forward(state.params1, g, topk=0.1, head="linear")
        assert float(jnp.max(jnp.abs(q))) < 60.0

    def test_cql_penalty_exact(self):
        import optax

        from meshdqn_tpu.rl import dqn_loss
        from meshdqn_tpu.rl.dqn import _q_values

        p_on = init_params(jax.random.PRNGKey(0), 17, 11, conv_width=8, topk=0.1)
        p_tg = init_params(jax.random.PRNGKey(1), 17, 11, conv_width=8, topk=0.1)
        buf, rng = self._buf(), np.random.default_rng(0)
        batch = buf.sample(8, rng)
        base = dict(topk=0.1, head="linear", gamma=0.99)
        l0 = float(dqn_loss(p_on, p_tg, batch, DQNConfig(**base)))
        l1 = float(dqn_loss(p_on, p_tg, batch, DQNConfig(**base, cql_alpha=0.5)))
        q = np.asarray(_q_values(p_on, batch.state, 0.1, "linear"))
        q_sa = q[np.arange(len(q)), np.asarray(batch.action)]
        lse = np.log(np.sum(np.exp(q), axis=1))
        assert np.isclose(l1, l0 + 0.5 * np.mean(lse - q_sa), rtol=1e-5)
        # the penalty is nonnegative (lse >= q_sa pointwise)
        assert l1 >= l0
