#!/usr/bin/env python
"""Measure the exact endgame solver's strength contribution.

Self-match with IDENTICAL weights and search settings — the only difference
is that side A plays perfect endgames (``mcts.exact_endgame_empties = E``,
native solver) while side B plays them from search statistics like the
reference does. Everything upstream of the endgame is shared (same
variables, same sims, shared transposition table), so any score gap is
attributable to exact endgame conversion alone.

Usage:
  python refbench/solver_strength.py --games 20 --sims 100 --empties 14 \
      --ckpt refbench/workdir_repo_train30/checkpoints

Outputs refbench/solver_strength.json (W/D/L from the solver side's
perspective + ELO diff 400*log10(s/(1-s))).
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


class Agent:
    def __init__(self, name, net, variables, sims, temperature, empties,
                 compat, tt):
        import jax
        from alphazero_reversi_tpu.config import MCTSConfig
        from alphazero_reversi_tpu.mcts import search as search_lib

        self.jax = jax
        self.name = name
        self.mcts = search_lib.MCTS(
            net, variables,
            MCTSConfig(num_simulations=sims, c_puct=1.0,
                       exact_endgame_empties=empties),
            compat=compat, transposition_table=tt)
        self.temperature = temperature
        self.key = jax.random.PRNGKey(0)
        self.exact_moves = 0

    def reseed(self, seed):
        self.key = self.jax.random.PRNGKey(seed)

    def select_move(self, board):
        from alphazero_reversi_tpu.mcts.search import ExactResult

        jax = self.jax
        state = jax.tree_util.tree_map(lambda x: x[None], board._state)
        self.key, k1 = jax.random.split(self.key)
        probs, result = self.mcts.get_action_probs(
            state, k1, temperature=self.temperature, add_noise=False)
        if isinstance(result, ExactResult):
            self.exact_moves += 1
        p = np.asarray(probs[0])
        action = int(np.random.choice(len(p), p=p / p.sum()))
        return (-1, -1) if action == 64 else divmod(action, 8)


def play_game(black, white, seed, compat):
    from alphazero_reversi_tpu.env.game import Board

    board = Board(compat=compat)
    black.reseed(seed)
    white.reseed(seed + 1)
    np.random.seed(seed)
    plies = 0
    while not board.game_over and plies < 130:
        agent = black if board.current_player == 1 else white
        assert board.make_move(*agent.select_move(board)), plies
        plies += 1
    w = board.winner or 0
    if w == 0:
        return "draw"
    return black.name if w == 1 else white.name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=20)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--empties", type=int, default=14)
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--rules", choices=["compat", "correct"],
                    default="compat",
                    help="rule mode (must match how the checkpoint was "
                         "trained; the 30-iteration checkpoints are compat)")
    ap.add_argument("--ckpt", default=os.path.join(
        HERE, "workdir_repo_train30/checkpoints"))
    ap.add_argument("--out", default=os.path.join(HERE,
                                                  "solver_strength.json"))
    args = ap.parse_args()
    compat = args.rules == "compat"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from alphazero_reversi_tpu import checkpoint as ckpt_lib
    from alphazero_reversi_tpu.config import ModelConfig
    from alphazero_reversi_tpu.mcts.transposition import TranspositionTable
    from alphazero_reversi_tpu.models import resnet

    net = resnet.build_network(ModelConfig())
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    restored = ckpt_lib.restore_best(args.ckpt, variables)
    if restored is None:
        raise FileNotFoundError(f"no best model under {args.ckpt}")
    variables = restored

    # Shared table: identical weights + sims mean identical search results;
    # only the endgame policy differs (and the solver path bypasses the TT).
    tt = TranspositionTable()
    solver_side = Agent("solver", net, variables, args.sims,
                        args.temperature, args.empties, compat, tt)
    plain_side = Agent("plain", net, variables, args.sims,
                       args.temperature, 0, compat, tt)

    rec = {"w": 0, "d": 0, "l": 0}
    t0 = time.time()
    for g in range(args.games):
        blk, wht = ((solver_side, plain_side) if g % 2 == 0
                    else (plain_side, solver_side))
        res = play_game(blk, wht, 4000 + 17 * g, compat)
        if res == "draw":
            rec["d"] += 1
        elif res == "solver":
            rec["w"] += 1
        else:
            rec["l"] += 1
        print(f"game {g + 1}/{args.games}: {res}  "
              f"({rec['w']}W/{rec['d']}D/{rec['l']}L, "
              f"exact moves so far {solver_side.exact_moves}, "
              f"{time.time() - t0:.0f}s)", flush=True)

    n = args.games
    score = (rec["w"] + 0.5 * rec["d"]) / n
    s = min(max(score, 1.0 / (4 * n)), 1 - 1.0 / (4 * n))
    out = {
        "protocol": {
            "games": n, "sims": args.sims, "empties": args.empties,
            "temperature": args.temperature, "ckpt": args.ckpt,
            "rules": args.rules,
            "note": "identical weights/search both sides; solver side "
                    "plays exact endgames at <= empties empty squares"},
        "solver_vs_plain": {
            **rec, "score": round(score, 3),
            "elo_diff": round(400 * math.log10(s / (1 - s)), 1),
            "exact_moves": solver_side.exact_moves,
            "seconds": round(time.time() - t0, 1)},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
