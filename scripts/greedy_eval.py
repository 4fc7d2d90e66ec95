"""Greedy policy evaluation: the deploy-relevant metric, cheaply.

Rolls ONE eps=0 episode (argmax actions, the deploy_dqn.py:201-202
semantics) with interpolated rewards only (no re-simulation) and reports
removals / do-nothings / total reward / terminal reason.  This is the
fast proxy for "how many verified removals would a deployment get" —
training reward alone can't distinguish a do-nothing farm from a policy
that coarsens (both score +15-ish; only the second one deploys).

Usage:
  python scripts/greedy_eval.py --config configs/ys930.yaml [--best] [--cpu]
         [--max-steps 200]

--best evaluates ckpt_best/ instead of the latest checkpoint.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--best", action="store_true")
    ap.add_argument(
        "--deploy", action="store_true",
        help="evaluate ckpt_best_deploy/ (the deploy-probe high water)",
    )
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-steps", type=int, default=400)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from meshdqn_tpu.env import AirfoilEnv
    from meshdqn_tpu.models import init_params
    from meshdqn_tpu.rl import DQNConfig, init_dqn, select_action
    from meshdqn_tpu.train import CheckpointManager
    from meshdqn_tpu.train.gtcache import load_or_compute_ground_truth
    from meshdqn_tpu.utils import Config

    cfg = Config.from_yaml(args.config).apply_overrides(args.overrides)
    base = os.path.join(cfg.save_dir, cfg.prefix.rstrip("_"))
    gt = load_or_compute_ground_truth(cfg, base, reuse_any_precision=True)

    n_actions = cfg.agent.N_closest + 1
    n_feat = 2 + 3 * (cfg.agent.solver_steps // cfg.agent.save_steps)
    p1 = init_params(jax.random.PRNGKey(0), n_feat, n_actions, conv_width=128, topk=0.1)
    p2 = init_params(jax.random.PRNGKey(1), n_feat, n_actions, conv_width=128, topk=0.1)
    # Mirror the trainer's DQNConfig exactly: the optimizer chain shape
    # (grad_clip adds a transform) must match the checkpointed opt-state
    # tree or orbax restore rejects it (same as cli/deploy.py).
    dqn = init_dqn(
        p1,
        p2,
        DQNConfig(
            lr=cfg.optimizer.lr,
            weight_decay=cfg.optimizer.weight_decay,
            gamma=cfg.epsilon.gamma,
            target_update=cfg.agent.target_update,
            head=cfg.agent.head,
            grad_clip=cfg.optimizer.grad_clip,
            target_mode=cfg.agent.target_mode,
            double=cfg.agent.double,
            target_clip=cfg.optimizer.target_clip,
            cql_alpha=cfg.optimizer.cql_alpha,
        ),
    )
    sub = (
        "ckpt_best_deploy"
        if args.deploy
        else "ckpt_best"
        if args.best
        else "ckpt"
    )
    ckpt = CheckpointManager(os.path.join(base, sub))
    restored = ckpt.restore(dqn)
    if restored is None:
        sys.exit(f"no checkpoint under {base}/{sub}")
    dqn, extras, step = restored
    print(f"checkpoint {sub}/step_{step} (episode {extras.get('episode')})")

    env = AirfoilEnv(cfg, ground_truth=gt)
    state = env.reset()
    env.calculate_reward()
    removals, dns, total, t = 0, 0, 0.0, 0
    reason = "max_steps"
    errs = []
    for t in range(args.max_steps):
        a = int(select_action(dqn.params1, state, topk=0.1))
        state, rew, done, info = env.step(a)
        total += rew
        if a < env.action_space_n:
            removals += 1
            # interpolated drag error of the final snapshot after this removal
            gtd = float(np.asarray(gt.gt_drag)[-1])
            errs.append(100.0 * abs(float(env.new_drags[-1]) - gtd) / abs(gtd))
        else:
            dns += 1
        if done:
            reason = info.terminal_reason or "done"
            break
    print(
        f"greedy episode: {t + 1} steps, {removals} removals, {dns} "
        f"do-nothings, reward {total:+.2f}, terminal={reason}"
    )
    if errs:
        print(
            f"interpolated drag err after each removal (%): "
            f"{[round(e, 3) for e in errs]}"
        )
        within = sum(1 for e in errs if e <= 100.0 * cfg.agent.threshold)
        print(f"removals within threshold (interpolated): {within}/{removals}")


if __name__ == "__main__":
    main()
