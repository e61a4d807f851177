#!/usr/bin/env python
"""Train the reference implementation for 10 iterations at the tiny matched
config (VERDICT item 4, option (i)+(ii) prep): produces
``workdir_train/checkpoints/best_model.pth`` + per-iteration ELO history for
the curve overlay, and the trained model for the cross-play bridge
(crossplay.py).

Config matches refbench/measure_repo.py / measure_reference.measure_pipeline:
4 games/iter, 100 sims, 5x128 net, train batch 64, 1 tournament round.
"""
import json
import os
import sys
import time

import torch

torch.set_num_threads(1)

HERE = os.path.dirname(os.path.abspath(__file__))
WORKDIR = os.path.join(HERE, os.environ.get("AZR_PARITY_WORKDIR", "workdir_train"))
OUT = os.path.join(HERE, os.environ.get("AZR_PARITY_OUT", "reference_training.json"))
REF = "/root/reference"

os.makedirs(WORKDIR, exist_ok=True)
os.chdir(WORKDIR)
sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(REF, "src"))

from src.config import Config  # noqa: E402
from src.trainer.pipeline import AlphaZeroPipeline  # noqa: E402

ITERATIONS = int(os.environ.get("AZR_PARITY_ITERS", "10"))

config = Config.load(os.path.join(REF, "configs/default_config.json"))
config.training.num_epochs = ITERATIONS
config.training.device = "cpu"
config.training.batch_size = 64
config.self_play.num_games = 4
config.mcts.num_simulations = 100  # smallest runnable point (see
# measure_reference.py: sims must exceed the 64-leaf batch or the reference's
# self-play loop never advances)
config.tournament.num_simulations = 100
config.tournament.rounds = 1
config.training.save_interval = 1
config.logging.use_tensorboard = False

pipe = AlphaZeroPipeline(config)
t0 = time.time()
pipe.train()
elapsed = time.time() - t0

# per-iteration ELO from the run log (the reference's logger writes
# "eval/elo=NNNN.NNNN" lines; it keeps no metrics_history attribute)
import glob
import re

elo_history = []
for logfile in sorted(glob.glob(os.path.join(WORKDIR, "logs", "*",
                                             "training.log"))):
    with open(logfile) as f:
        elos = re.findall(r"eval/elo=([0-9.]+)", f.read())
    if len(elos) > len(elo_history):
        elo_history = [float(x) for x in elos]

result = {
    "iterations": ITERATIONS,
    "total_s": round(elapsed, 1),
    "sec_per_iteration": round(elapsed / ITERATIONS, 1),
    "workdir": WORKDIR,
    "elo_history": elo_history,
}
with open(OUT, "w") as f:
    json.dump(result, f, indent=2, default=str)
print(json.dumps(result, default=str), flush=True)
