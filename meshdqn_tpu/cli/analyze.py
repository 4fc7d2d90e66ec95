"""Analysis entry point.

    python -m meshdqn_tpu.cli.analyze reward  --dir training_results/ys930_results --prefix ys930_results_
    python -m meshdqn_tpu.cli.analyze actions --dir ... --prefix ...
    python -m meshdqn_tpu.cli.analyze benchmark --sweep <csv> --deployed <dir> --obj ys930_results
    python -m meshdqn_tpu.cli.analyze sweep --config configs/ys930.yaml --meshes a.xdmf b.xdmf --out sweep.csv

Replaces the reference's training_results/{plot_reward,analyze_actions,
analyze_benchmark}.py scripts (run-in-place with hand-edited flags).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("reward")
    r.add_argument("--dir", required=True)
    r.add_argument("--prefix", required=True)

    a = sub.add_parser("actions")
    a.add_argument("--dir", required=True)
    a.add_argument("--prefix", required=True)
    a.add_argument("--n-actions", type=int, default=181)

    b = sub.add_parser("benchmark")
    b.add_argument("--sweep", required=True)
    b.add_argument("--deployed", required=True)
    b.add_argument("--obj", required=True)

    s = sub.add_parser("sweep")
    s.add_argument("--config", required=True)
    s.add_argument("--meshes", nargs="+", required=True)
    s.add_argument("--out", required=True)

    args = ap.parse_args(argv)

    from ..analysis import (
        analyze_actions,
        benchmark_figure,
        plot_reward,
        run_resolution_sweep,
    )

    if args.cmd == "reward":
        print(json.dumps(plot_reward(args.dir, args.prefix)))
    elif args.cmd == "actions":
        print(json.dumps(analyze_actions(args.dir, args.prefix, args.n_actions)))
    elif args.cmd == "benchmark":
        print(json.dumps(benchmark_figure(args.sweep, args.deployed, args.obj)))
    elif args.cmd == "sweep":
        from ..utils import Config

        cfg = Config.from_yaml(args.config)
        df = run_resolution_sweep(args.meshes, cfg, args.out)
        print(df.to_string(index=False))


if __name__ == "__main__":
    main()
