"""Deployment entry point.

    python -m meshdqn_tpu.cli.deploy --config configs/ys930.yaml \
        [--no-complete-traj] [--use-best] [--confirm] [--max-steps N] \
        [--checkpoint DIR] [section.key=value ...]

Replaces `python3 deploy_dqn.py` (reference README.md:30-37) with flags
instead of edited module constants (deploy_dqn.py:58-69: complete_traj,
plot_traj, end_plots, use_best, RESTART, CONFIRM).
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--no-complete-traj", action="store_true")
    ap.add_argument("--plot-traj", action="store_true")
    ap.add_argument("--no-end-plots", action="store_true")
    ap.add_argument("--use-best", action="store_true")
    ap.add_argument("--confirm", action="store_true")
    ap.add_argument(
        "--restart",
        action="store_true",
        help="resume an interrupted deployment from its per-step resume "
        "state; artifacts are re-prefixed restart_ (RESTART, "
        "deploy_dqn.py:68, 113-124)",
    )
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument(
        "--verified",
        action="store_true",
        help="extension beyond the reference: when the complete_traj "
        "re-simulation of a removal breaches the accuracy threshold, roll "
        "that removal back, mask the vertex, and continue — every removal "
        "in the recorded trajectory is re-sim-verified",
    )
    ap.add_argument("--max-rejections", type=int, default=12)
    ap.add_argument(
        "--resim-method",
        default="dense",
        choices=["dense", "cg"],
        help="solver path for complete_traj re-simulations: 'dense' = "
        "fused invert-once (fastest solve, ~471 MB device state per solver "
        "instance, which the axon worker leaks), 'cg' = sparse banded "
        "block-Jacobi PCG (flat ~20 MB footprint; use for many-removal "
        "verified deploys)",
    )
    ap.add_argument(
        "--recycle-every",
        type=int,
        default=0,
        help="exit(75) after N re-simulations for a lossless process "
        "recycle via scripts/run_deploy.sh (the axon remote client "
        "degrades superlinearly with accumulated solver instances, "
        "docs/AXON.md); 0 = off",
    )
    ap.add_argument(
        "--surrogate",
        action="store_true",
        help="use a pretrained AirfoilGCNN drag surrogate "
        "(SURROGATE_MODEL, deploy_dqn.py:19)",
    )
    ap.add_argument("--surrogate-path", default=None)
    ap.add_argument(
        "--ckpt-dir",
        default="ckpt",
        help="checkpoint subtree to deploy, relative to the run dir (or an "
        "absolute path): 'ckpt' (latest), 'ckpt_best' (highest reward "
        "MA1000) or 'ckpt_best_deploy' (best greedy-removal probe, "
        "train/trainer.py _deploy_probe)",
    )
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--precision",
        default="auto",
        choices=["auto", "f64", "f32", "mixed"],
        help="solver precision for re-simulation; auto = fused f32 on TPU "
        "(seconds per removal), f64 oracle on CPU",
    )
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..deploy import Deployer, DeployOptions
    from ..rl import DQNConfig, init_dqn
    from ..train import CheckpointManager
    from ..train.gtcache import load_or_compute_ground_truth
    from ..models import init_params
    from ..utils import Config

    cfg = Config.from_yaml(args.config).apply_overrides(args.overrides)
    if args.precision == "auto":
        cfg.flow.precision = "f32" if jax.default_backend() == "tpu" else "f64"
    else:
        cfg.flow.precision = args.precision
    user_set_pad = any(o.startswith("flow.pad_quantum=") for o in args.overrides)
    if cfg.flow.pad_quantum == 0 and not user_set_pad and (
        jax.default_backend() == "tpu"
    ):
        # Training never re-simulates, so pack configs ship pad_quantum=0;
        # deploy re-simulations without it pay a fresh remote compile per
        # removal (~60 s vs 8.6 s measured, r5).  Quantized padding is
        # mathematically exact (tests/test_solver.py::TestPadQuantum);
        # pass flow.pad_quantum=0 explicitly to disable.
        cfg.flow.pad_quantum = 128
        print("deploy: defaulting flow.pad_quantum=128 on TPU (compile reuse)")
    base = os.path.join(cfg.save_dir, cfg.prefix.rstrip("_"))

    # Validate/refresh the cached ground truth exactly as the trainer does
    # (fingerprint sidecar records the precision used), so deploy can never
    # bless a GT computed under a different flow config into the run dir.
    gt = load_or_compute_ground_truth(cfg, base, reuse_any_precision=True)

    # Load the trained net from the run's checkpoints.
    n_actions = cfg.agent.N_closest + 1
    n_feat = 2 + 3 * (cfg.agent.solver_steps // cfg.agent.save_steps)
    p1 = init_params(jax.random.PRNGKey(0), n_feat, n_actions, conv_width=128, topk=0.1)
    p2 = init_params(jax.random.PRNGKey(1), n_feat, n_actions, conv_width=128, topk=0.1)
    # Mirror the trainer's DQNConfig exactly: the optimizer chain shape
    # (grad_clip adds a transform) must match the checkpointed opt-state
    # tree or orbax restore rejects it.
    dqn = init_dqn(
        p1,
        p2,
        DQNConfig(
            lr=cfg.optimizer.lr,
            weight_decay=cfg.optimizer.weight_decay,
            gamma=cfg.epsilon.gamma,
            target_update=cfg.agent.target_update,
            topk=0.1,
            head=cfg.agent.head,
            grad_clip=cfg.optimizer.grad_clip,
            target_mode=cfg.agent.target_mode,
            double=cfg.agent.double,
            target_clip=cfg.optimizer.target_clip,
            cql_alpha=cfg.optimizer.cql_alpha,
        ),
    )
    ckpt_dir = (
        args.ckpt_dir
        if os.path.isabs(args.ckpt_dir)
        else os.path.join(base, args.ckpt_dir)
    )
    ckpt = CheckpointManager(ckpt_dir)
    restored = ckpt.restore(dqn)
    ckpt_step = None
    if restored is not None:
        dqn = restored[0]
        ckpt_step = restored[2]
        print(f"loaded checkpoint step {ckpt_step}")
    else:
        print("WARNING: no checkpoint found; deploying an untrained net")

    opts = DeployOptions(
        complete_traj=not args.no_complete_traj,
        plot_traj=args.plot_traj,
        end_plots=not args.no_end_plots,
        use_best=args.use_best,
        confirm=args.confirm,
        surrogate_model=args.surrogate,
        surrogate_path=args.surrogate_path,
        restart=args.restart,
        verified=args.verified,
        max_rejections=args.max_rejections,
        recycle_every=args.recycle_every,
        resim_method=args.resim_method,
    )
    deployer = Deployer(cfg, gt, dqn.params1, options=opts)
    # Provenance: record which checkpoint produced this deployment (the
    # reference copies the .pt files into deployed/, deploy_dqn.py:126-190).
    import json

    with open(os.path.join(deployer.out_dir, "checkpoint_used.json"), "w") as f:
        json.dump(
            {
                "checkpoint_step": ckpt_step,
                "checkpoint_dir": ckpt_dir,
                "precision": cfg.flow.precision,
                "use_best": args.use_best,
            },
            f,
        )
    deployer.run(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
