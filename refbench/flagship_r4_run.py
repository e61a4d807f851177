#!/usr/bin/env python
"""Round-4 flagship training run on the real chip.

Purpose (VERDICT r3 items 1 + 7):

* a hardware datapoint that the single-chip flagship iteration time is
  unchanged through the round-4 code paths (collective-free Dirichlet
  sampler in the search, watchdog-guarded fetches, the de-gated
  steps_per_dispatch plumbing) — compare iteration seconds against the r3
  resume logs (~12-16 s warm);
* a checkpoint-per-iteration history (save_best_only=False) with logged
  promotion decisions, feeding refbench/promotion_gate_check.py (the
  promoted-vs-rejected ground-truth match).

Usage: python refbench/flagship_r4_run.py [iterations] [outdir]
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else \
    f"/root/repo/runs_flagship/run_r4_{time.strftime('%Y%m%d_%H%M%S')}"


def main():
    cfg = Config.load("/root/repo/configs/flagship_run.json")
    cfg.training.num_epochs = ITERS
    cfg.training.checkpoint_dir = os.path.join(OUTDIR, "checkpoints")
    cfg.training.fetch_timeout_s = 180.0  # relay-hang watchdog, armed
    cfg.self_play.save_dir = os.path.join(OUTDIR, "self_play_data")
    cfg.self_play.save_every = 0
    cfg.logging.log_dir = os.path.join(OUTDIR, "logs")
    cfg.logging.use_tensorboard = False
    cfg.logging.save_best_only = False  # keep EVERY checkpoint for the
    # promotion-gate ground-truth match
    cfg.tournament.batch_rounds = True
    os.makedirs(OUTDIR, exist_ok=True)
    cfg.save(os.path.join(OUTDIR, "config.json"))

    print(f"devices: {jax.devices()}", flush=True)
    pipe = AlphaZeroPipeline(cfg, run_name="r4_gate")
    if pipe.load_checkpoint():
        print(f"resumed at iteration {pipe.iteration}", flush=True)
    t0 = time.time()
    pipe.train()
    wall = time.time() - t0

    path = os.path.join(OUTDIR, "metrics.jsonl")
    with open(path, "w") as f:
        for i, m in enumerate(pipe.metrics_history):
            f.write(json.dumps({"iteration": i, **{
                k: float(v) for k, v in m.items()}}) + "\n")
    print(f"done: {len(pipe.metrics_history)} iterations in {wall:.0f}s "
          f"-> {path}", flush=True)


if __name__ == "__main__":
    main()
