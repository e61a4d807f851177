#!/usr/bin/env python
"""Round-5 flagship training run on the real chip.

Purpose:

* rebuild a trained flagship model on this (fresh) host — the r3/r4 run
  directories with trained checkpoints are not part of the repo — as the
  subject for the round-5 measurements: the tree-reuse strength match
  (refbench/reuse_strength.py, VERDICT r4 item 4) and the phase-floor
  analysis (VERDICT r4 item 7);
* a hardware datapoint that the single-chip flagship iteration time is
  unchanged through the round-5 code paths (mesh-sharded eval arena,
  sharded replay buffer plumbing, tree-reuse OFF default) — compare
  against the r4 leg's 8.2 s median (PARITY.md);
* per-iteration phase timings (metrics.jsonl) feeding the phase-floor
  close-out in PERF.md.

Usage: python refbench/flagship_r5_run.py [iterations] [outdir] [--reuse]
`--reuse` sets mcts.tree_reuse=root for self-play (a follow-on training
leg through the reuse path; the base leg keeps the r4 recipe).
Writes <outdir>/metrics.jsonl and full it_NNNNNN checkpoints.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline  # noqa: E402

args = [a for a in sys.argv[1:] if not a.startswith("--")]
ITERS = int(args[0]) if args else 30
OUTDIR = args[1] if len(args) > 1 else \
    f"/root/repo/runs_flagship/run_r5_{time.strftime('%Y%m%d_%H%M%S')}"
REUSE = "--reuse" in sys.argv


def main():
    cfg = Config.load("/root/repo/configs/flagship_run.json")
    cfg.training.num_epochs = ITERS
    cfg.training.checkpoint_dir = os.path.join(OUTDIR, "checkpoints")
    cfg.training.fetch_timeout_s = 180.0  # relay-hang watchdog, armed
    cfg.self_play.save_dir = os.path.join(OUTDIR, "self_play_data")
    cfg.self_play.save_every = 0
    cfg.logging.log_dir = os.path.join(OUTDIR, "logs")
    cfg.logging.use_tensorboard = False
    cfg.logging.save_best_only = False  # keep EVERY checkpoint: the
    # strength-chain matches and the reuse match need specific iterations
    cfg.tournament.batch_rounds = True
    if REUSE:
        cfg.mcts.tree_reuse = "root"
    os.makedirs(OUTDIR, exist_ok=True)
    cfg.save(os.path.join(OUTDIR, "config.json"))

    print(f"devices: {jax.devices()} reuse={REUSE}", flush=True)
    pipe = AlphaZeroPipeline(cfg, run_name="r5_flagship")
    if pipe.load_checkpoint():
        print(f"resumed at iteration {pipe.iteration}", flush=True)
    t0 = time.time()
    pipe.train()
    wall = time.time() - t0

    path = os.path.join(OUTDIR, "metrics.jsonl")
    with open(path, "w") as f:
        for i, m in enumerate(pipe.metrics_history):
            f.write(json.dumps({"iteration": i + 1, **m}) + "\n")
    print(f"done: {ITERS} iterations in {wall:.0f}s "
          f"({wall / max(ITERS, 1):.1f}s/it) -> {path}", flush=True)


if __name__ == "__main__":
    main()
