#!/usr/bin/env python
"""Run the full pipeline in a timestamped run directory.

Mirrors /root/reference/run.py (and its near-duplicate run_pipeline.py):
loads a config, rewrites all output paths into ``<output>/run_<timestamp>/``,
and trains — with ``--resume`` to continue from the latest checkpoint
(run.py:17-91).
"""
import argparse

from alphazero_reversi_tpu.cli import main as cli_main


def main() -> int:
    p = argparse.ArgumentParser(description="Run the AlphaZero pipeline")
    p.add_argument("--config", "-c", default=None)
    p.add_argument("--output", "-o", default="runs",
                   help="parent directory for the timestamped run dir")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    argv = ["train", "--run-dir", args.output]
    if args.config:
        argv += ["--config", args.config]
    if args.iterations is not None:
        argv += ["--iterations", str(args.iterations)]
    if args.resume:
        argv += ["--resume"]
    return cli_main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
