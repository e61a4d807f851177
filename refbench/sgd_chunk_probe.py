#!/usr/bin/env python
"""steps_per_dispatch sweep at flagship scale, on the real chip.

The flagship config runs 480 SGD steps/iteration in chunks of K=64 —
~8 dispatches of ~0.15-0.25 s relay latency each. This probe times one
full iteration's SGD (480 steps, batch 128) at K in {64, 160, 480} from
the it-250 flagship checkpoint's REAL replay buffer (200k positions), to
ask whether fewer/bigger dispatches buy anything or scan-length compile
cost / HBM pressure eats the win.

Honest-timing rules per PERF.md: each cell ends in a host fetch of the
loss; fresh PRNG keys per repeat; first rep of each K is compile and
reported separately.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from alphazero_reversi_tpu import checkpoint as ckpt_lib
from alphazero_reversi_tpu import learner as learner_lib
from alphazero_reversi_tpu.config import Config
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.pipeline import make_checkpoint_template

RUN = "/root/repo/runs_flagship/run_r4_gate"
TOTAL_STEPS = 480


def main() -> None:
    cfg = Config.load(f"{RUN}/config.json")
    template = make_checkpoint_template(cfg)
    tree = ckpt_lib.restore_checkpoint(f"{RUN}/checkpoints/it_000250",
                                       template)
    buffer = jax.device_put(tree["replay"])
    print(f"replay size: {int(np.asarray(buffer.size))}", flush=True)

    for chunk in (64, 160, 480):
        lrn = learner_lib.Learner(
            resnet.build_network(cfg.model),
            {"params": tree["state"].params,
             "batch_stats": tree["state"].batch_stats},
            cfg.training)
        n_chunks = TOTAL_STEPS // chunk
        for rep in range(3):
            key = jax.random.PRNGKey(time.time_ns() % (1 << 31))
            t0 = time.perf_counter()
            loss = 0.0
            for c in range(n_chunks):
                metrics = lrn.steps(
                    buffer, jax.random.fold_in(key, c), chunk,
                    cfg.training.batch_size)
                loss = metrics["loss"]
            loss = float(np.asarray(loss))  # force + fetch
            dt = time.perf_counter() - t0
            tag = "compile" if rep == 0 else "warm"
            print(f"K={chunk:4d} ({n_chunks:2d} dispatches) rep{rep} "
                  f"[{tag}]: {dt:6.2f} s  loss {loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
