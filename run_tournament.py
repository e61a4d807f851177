#!/usr/bin/env python
"""Round-robin ELO tournament over saved checkpoints + a random baseline.

Mirrors /root/reference/run_tournament.py:34-163 (checkpoint discovery,
persistent ELO JSON across runs).
"""
import argparse

from alphazero_reversi_tpu.cli import main as cli_main


def main() -> int:
    p = argparse.ArgumentParser(description="Run a checkpoint tournament")
    p.add_argument("--config", "-c", default=None)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--rounds", type=int, default=None)
    args = p.parse_args()

    argv = ["tournament", "--model-dir", args.model_dir]
    if args.config:
        argv += ["--config", args.config]
    if args.rounds is not None:
        argv += ["--rounds", str(args.rounds)]
    return cli_main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
