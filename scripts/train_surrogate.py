"""Train the AirfoilGCNN drag surrogate from environment rollouts.

The reference's deploy path can load a pretrained drag surrogate
(deploy_dqn.py:19, 95-100) but the repo ships neither the model nor its
training code.  This script provides the workflow end-to-end: random
coarsening rollouts generate (graph state, final-snapshot drag) pairs —
drag labels come from the probe re-integration the env already performs —
then models/surrogate_train.py fits the regressor and saves
`<run>/<prefix>surrogate_model.npz` for `deploy --surrogate`.

Usage:
    python scripts/train_surrogate.py --config configs/ys930.yaml \
        [--pairs 400] [--epochs 300] [--conv-width 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--pairs", type=int, default=400)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--conv-width", type=int, default=64)
    ap.add_argument("--topk", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    import meshdqn_tpu  # noqa: F401
    from meshdqn_tpu.env import AirfoilEnv
    from meshdqn_tpu.models.surrogate_train import save_surrogate, train_surrogate
    from meshdqn_tpu.train.gtcache import load_or_compute_ground_truth
    from meshdqn_tpu.utils import Config

    cfg = Config.from_yaml(args.config)
    run_dir = os.path.join(cfg.save_dir, cfg.prefix.rstrip("_"))
    gt = load_or_compute_ground_truth(cfg, run_dir)
    env = AirfoilEnv(cfg, ground_truth=gt)

    rng = np.random.default_rng(args.seed)
    states, labels = [], []
    state = env.reset()
    while len(states) < args.pairs:
        states.append(state)
        labels.append(float(np.asarray(env.new_drags)[-1]))
        action = int(rng.integers(0, env.action_space_n + 1))
        state, _, done, _ = env.step(action)
        if done:
            state = env.reset()
    print(f"collected {len(states)} (state, drag) pairs", flush=True)

    graphs = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *states)
    params, report = train_surrogate(
        graphs,
        np.asarray(labels),
        conv_width=args.conv_width,
        topk=args.topk,
        epochs=args.epochs,
        seed=args.seed,
        log_every=50,
    )
    out = args.out or os.path.join(run_dir, cfg.prefix + "surrogate_model.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_surrogate(out, params, conv_width=args.conv_width, topk=args.topk)
    report["path"] = out
    with open(out.replace(".npz", "_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
