#!/usr/bin/env python
"""Move-by-move probe of the reference self-play hang at sims=25."""
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/src")
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "workdir"))
sys.setrecursionlimit(100000)

import torch
torch.set_num_threads(1)

from src.config import Config
from src.game import ReversiGame
from src.mcts.mcts import MCTS
from src.model.network import AlphaZeroNetwork

config = Config.load("/root/reference/configs/default_config.json")
model = AlphaZeroNetwork(board_size=8,
                         num_res_blocks=config.model.num_res_blocks,
                         num_filters=config.model.num_filters)
model.eval()

mcts = MCTS(model=model, num_simulations=25, batch_size=64)
game = ReversiGame()
move_no = 0
while not game.is_game_over() and move_no < 70:
    t0 = time.time()
    mv, action_probs = mcts.get_action_probs(game, temperature=1.0)
    dt = time.time() - t0
    ok = game.make_move(*mv)
    mcts.update_with_move(mv)
    print("move %2d: %.2fs  mv=%s ok=%s player=%d" %
          (move_no, dt, mv, ok, game.current_player), flush=True)
    move_no += 1
print("done: over=%s score=%s" % (game.is_game_over(), game.get_score()),
      flush=True)
