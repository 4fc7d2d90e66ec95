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

    # Startup PAUSE poll: a freshly relaunched trainer spends minutes in
    # restore + first-sweep compile before the in-loop poll runs, which can
    # outlast a pauser's handshake window (observed r4: bench pause timed
    # out against a trainer that had just relaunched).  Nothing is live yet,
    # so acking here is trivially lossless.
    import os
    import sys

    run_dir = os.path.join(cfg.save_dir, cfg.prefix.rstrip("_"))
    pause_f = os.path.join(run_dir, "PAUSE")
    if os.path.exists(pause_f):
        try:
            os.replace(pause_f, os.path.join(run_dir, "PAUSED"))
        except OSError:
            pass
        print("PAUSE present at startup; acked before any work", flush=True)
        sys.exit(76)

    trainer = Trainer(cfg, resume=not args.no_resume)
    summary = trainer.train(num_episodes=args.episodes, max_steps=args.max_steps)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
