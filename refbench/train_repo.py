#!/usr/bin/env python
"""Train THIS framework for 10 iterations at the tiny matched config — the
counterpart of refbench/train_reference.py for the strength-parity
comparison (VERDICT item 4). Produces workdir_repo_train/checkpoints
(best model for crossplay.py) and the per-iteration eval/elo curve.

Config matched to the reference run: 4 games/iter, 100 sims, 5x128 net,
train batch 64, 1 tournament round, checkpoints every iteration.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

HERE = os.path.dirname(os.path.abspath(__file__))
WORKDIR = os.path.join(HERE, os.environ.get("AZR_PARITY_WORKDIR", "workdir_repo_train"))
OUT = os.path.join(HERE, os.environ.get("AZR_PARITY_OUT", "repo_training.json"))
os.makedirs(WORKDIR, exist_ok=True)
os.chdir(WORKDIR)

if os.environ.get("AZR_PLATFORM"):  # e.g. "cpu" when the TPU relay is down
    import jax

    jax.config.update("jax_platforms", os.environ["AZR_PLATFORM"])

from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline  # noqa: E402

ITERATIONS = int(os.environ.get("AZR_PARITY_ITERS", "10"))

config = Config()
# exact-endgame value relabeling arm (selfplay.exact_value_empties);
# 0 = the original protocol
config.self_play.exact_value_empties = int(
    os.environ.get("AZR_EXACT_VALUE_EMPTIES", "0"))
config.mcts.num_simulations = 100
config.self_play.num_games = 4
config.self_play.num_parallel_games = 4
config.training.num_epochs = ITERATIONS
config.training.batch_size = 64
config.training.save_interval = 1
config.tournament.num_simulations = 100
config.tournament.rounds = 1
config.logging.use_tensorboard = False

pipe = AlphaZeroPipeline(config, run_name="parity")
t0 = time.time()
pipe.train()
elapsed = time.time() - t0

result = {
    "iterations": ITERATIONS,
    "total_s": round(elapsed, 1),
    "sec_per_iteration": round(elapsed / ITERATIONS, 1),
    "workdir": WORKDIR,
    "elo_history": [m.get("eval/elo") for m in pipe.metrics_history],
    "loss_history": [round(float(m["train/loss"]), 4)
                     for m in pipe.metrics_history],
}
with open(OUT, "w") as f:
    json.dump(result, f, indent=2, default=str)
print(json.dumps(result, default=str), flush=True)
