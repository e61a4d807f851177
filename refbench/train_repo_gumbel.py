#!/usr/bin/env python
"""Train with Gumbel self-play at a THIRD of the search budget (32 sims vs
the parity runs' 100) — the few-simulation training claim of Danihelka et
al. 2022 applied to this framework.

Config matches refbench/train_repo.py (4 games/iter, 5x128 net, train batch
64, 30 iterations — the setup whose PUCT-100 product beat the reference
25-0-4, PARITY.md) except the search: ``mcts.algorithm="gumbel"``,
``num_simulations=32``. The product checkpoint is then cross-played against
the PUCT-100-trained checkpoint by refbench/gumbel_train_match.py.

Outputs: workdir_repo_gumbel/checkpoints + repo_training_gumbel.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if os.environ.get("AZR_CPU", "1") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))
WORKDIR = os.path.join(HERE, os.environ.get("AZR_PARITY_WORKDIR",
                                            "workdir_repo_gumbel"))
OUT = os.path.join(HERE, os.environ.get("AZR_PARITY_OUT",
                                        "repo_training_gumbel.json"))
os.makedirs(WORKDIR, exist_ok=True)
os.chdir(WORKDIR)

from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline  # noqa: E402

ITERATIONS = int(os.environ.get("AZR_PARITY_ITERS", "30"))
SIMS = int(os.environ.get("AZR_GUMBEL_SIMS", "32"))

config = Config()
config.mcts.algorithm = "gumbel"
config.mcts.num_simulations = SIMS
config.mcts.max_depth = 24
config.self_play.num_games = 4
config.self_play.num_parallel_games = 4
config.training.num_epochs = ITERATIONS
config.training.batch_size = 64
config.training.save_interval = 1
config.tournament.algorithm = "gumbel"
config.tournament.num_simulations = SIMS
config.tournament.rounds = 1
config.logging.use_tensorboard = False

pipe = AlphaZeroPipeline(config, run_name="parity_gumbel")
t0 = time.time()
pipe.train()
elapsed = time.time() - t0

result = {
    "iterations": ITERATIONS,
    "algorithm": "gumbel",
    "num_simulations": SIMS,
    "total_s": round(elapsed, 1),
    "sec_per_iteration": round(elapsed / ITERATIONS, 1),
    "workdir": WORKDIR,
    "elo_history": [m.get("eval/elo") for m in pipe.metrics_history],
    "loss_history": [round(float(m["train/loss"]), 4)
                     for m in pipe.metrics_history],
}
with open(OUT, "w") as f:
    json.dump(result, f, indent=2)
print("wrote", OUT, result["sec_per_iteration"], "s/iter")
