"""Training entry point.

    python -m meshdqn_tpu.cli.train --config configs/ys930.yaml \
        [--episodes N] [--max-steps N] [--no-resume] [section.key=value ...]

Replaces `python3 airfoil_dqn.py` (reference README.md:18) — the reference
configures runs by editing module constants (RESTART/PREFIX,
airfoil_dqn.py:343-346); here everything is flags/overrides.
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--episodes", type=int, default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("overrides", nargs="*", help="section.key=value")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..train import Trainer
    from ..utils import Config

    cfg = Config.from_yaml(args.config).apply_overrides(args.overrides)
    trainer = Trainer(cfg, resume=not args.no_resume)
    summary = trainer.train(num_episodes=args.episodes, max_steps=args.max_steps)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
