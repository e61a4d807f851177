#!/usr/bin/env python
"""Probe where the reference pipeline's tiny-config self-play hangs.

Round-1 measurement left `pipeline_tiny` stuck on "Generating game 1/4" for
95+ minutes at 25 sims — this reproduces just the first self-play game with a
faulthandler traceback dump every 30 s so the hang site is visible.
"""
import faulthandler
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/src")
os.chdir(os.path.join(HERE, "workdir"))

import torch
torch.set_num_threads(1)  # single physical core; avoid intra-op thrashing

faulthandler.dump_traceback_later(30, repeat=True)

from src.config import Config
from src.model.network import AlphaZeroNetwork
from src.self_play.self_play import SelfPlay

config = Config.load("/root/reference/configs/default_config.json")
model = AlphaZeroNetwork(
    board_size=8,
    num_res_blocks=config.model.num_res_blocks,
    num_filters=config.model.num_filters,
)
model.eval()

sp = SelfPlay(
    game_class=None,
    model=model,
    num_simulations=25,
    temperature=1.0,
    device="cpu",
) if False else None

# Build SelfPlay the way the pipeline does (src/trainer/pipeline.py:152-170)
import inspect
from src.trainer.pipeline import AlphaZeroPipeline

config.training.device = "cpu"
config.self_play.num_games = 1
config.mcts.num_simulations = 25
config.logging.use_tensorboard = False
pipe = AlphaZeroPipeline(config)
t0 = time.time()
data = pipe._generate_self_play_data()
print("one-game self-play took %.1f s, %d examples" %
      (time.time() - t0, len(data[0]) if isinstance(data, tuple) else -1),
      flush=True)
