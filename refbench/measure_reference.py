#!/usr/bin/env python
"""Measure the reference implementation on THIS machine (BASELINE.md's own
"first measurement task"; VERDICT round-1 item 3).

Protocols mirror the reference's own harnesses exactly:

* env stepping  — the 100k-move greedy loop of
  /root/reference/test_cython_performance_fixed.py:10-46, driven over the
  pure-Python ``Board`` — the engine the live pipeline actually uses
  (src/game/__init__.py:6-7 exports it; the Cython board has no compiled .so
  here and its flip logic is defective anyway, SURVEY.md §2.2).
* MCTS          — /root/reference/src/mcts/MCTS_benchmark.py:101-191 with
  its DummyModel at sims=100 across batch sizes {1,8,16,32,64} (CPU; no CUDA
  on this machine), reporting time/search and nodes/s.
* flagship MCTS — the real ``AlphaZeroNetwork`` at the reference's default
  operating point (5 res blocks x 128 filters, 400 sims, batch 64 —
  configs/default_config.json) timed over get_action_probs calls from the
  opening, reporting seconds/move == the quantity our `mcts_moves_per_s`
  benchmark inverts.
* pipeline      — per-iteration wall time of AlphaZeroPipeline.train at a
  small config (4 games, 25 sims, 1 tournament round), the analog of
  VERDICT's "per-iteration wall time at a tiny config".

Results stream into reference_measurements.json after each stage so a crash
in a later stage loses nothing.
"""
import json
import os
import sys
import time

import torch
torch.set_num_threads(1)  # single physical core; intra-op threads thrash

HERE = os.path.dirname(os.path.abspath(__file__))
WORKDIR = os.path.join(HERE, "workdir")
OUT = os.path.join(HERE, "reference_measurements.json")
REF = "/root/reference"

os.makedirs(WORKDIR, exist_ok=True)
os.chdir(WORKDIR)  # reference code writes run dirs relative to cwd
sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(REF, "src"))

RESULTS = {"machine": "single CPU core (reference is CPU/CUDA; no CUDA here)",
           "protocols": "see refbench/measure_reference.py docstring"}


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)


def log(msg):
    print(msg, flush=True)


# ---------------------------------------------------------------- env loop
def measure_env():
    from game.board import Board  # the live engine (src/game/__init__.py:6)

    num_moves = 100_000
    board = Board()
    consecutive_passes = 0
    move_count = 0
    t0 = time.time()
    for _ in range(num_moves):
        valid_moves = board.get_valid_moves()
        if not valid_moves:
            board.make_move(-1, -1)
            consecutive_passes += 1
            if consecutive_passes >= 2:
                board = Board()
                consecutive_passes = 0
        else:
            consecutive_passes = 0
            row, col = valid_moves[0]
            board.make_move(row, col)
            move_count += 1
    elapsed = time.time() - t0
    return {"num_moves": num_moves, "elapsed_s": round(elapsed, 3),
            "moves_per_s": round(num_moves / elapsed, 1),
            "engine": "pure-Python Board (the one the live pipeline uses)"}


# ------------------------------------------------------------- MCTS sweep
def measure_mcts_sweep():
    from mcts.MCTS_benchmark import MCTSBenchmark

    bench = MCTSBenchmark(board_size=8, num_simulations=100,
                          batch_sizes=[1, 8, 16, 32, 64], use_cuda=False)
    results = bench.run_benchmark(num_runs=3)
    return [{"batch_size": r["batch_size"],
             "avg_time_s": round(float(r["avg_time"]), 4),
             "nodes_per_s": round(float(r["avg_nodes_per_sec"]), 1)}
            for r in results]


# --------------------------------------------------------- flagship search
def measure_flagship():
    import numpy as np
    from game.game import ReversiGame
    from model.network import AlphaZeroNetwork
    from src.mcts.mcts import MCTS

    model = AlphaZeroNetwork(board_size=8, num_res_blocks=5, num_filters=128)
    model.eval()
    game = ReversiGame(size=8)
    mcts = MCTS(model=model, num_simulations=400, batch_size=64)

    # warmup (includes TorchScript JIT)
    mcts.get_action_probs(game.copy(), temperature=1.0)

    times = []
    g = ReversiGame(size=8)
    for _ in range(8):
        if g.is_game_over():
            g = ReversiGame(size=8)
        t0 = time.time()
        _, probs = mcts.get_action_probs(g.copy(), temperature=1.0)
        times.append(time.time() - t0)
        # play the argmax move to vary the position
        a = int(np.argmax(probs))
        move = (-1, -1) if a == 64 else divmod(a, 8)
        g.make_move(*move)
        mcts.update_with_move(move)
    sec_per_move = sum(times) / len(times)
    return {"net": "AlphaZeroNetwork 5x128 (default_config.json)",
            "num_simulations": 400, "batch_size": 64, "moves_timed": len(times),
            "sec_per_move": round(sec_per_move, 3),
            "moves_per_s": round(1.0 / sec_per_move, 3),
            "nn_nodes_per_s": round(400 / sec_per_move, 1)}


# ------------------------------------------------------------- pipeline it
def measure_pipeline():
    from src.config import Config
    from src.trainer.pipeline import AlphaZeroPipeline

    config = Config.load(os.path.join(REF, "configs/default_config.json"))
    # tiny operating point, same code path (VERDICT: "run.py +
    # configs/default_config.json scaled down")
    config.training.num_epochs = 2
    config.training.device = "cpu"
    config.training.batch_size = 64
    config.self_play.num_games = 4
    # NOTE: sims must exceed the MCTS batch size (64): with sims <= batch
    # the reference runs a single simulation round in which every descent
    # stops at the unexpanded root, backprop paths are empty, all visit
    # counts stay 0, and get_action_probs argmaxes an all-zero vector to
    # the invalid move (0,0) -- make_move refuses it and self-play's
    # while-loop never advances (reproduced in probe2.py: 95 min stuck on
    # game 1 at sims=25). 100 sims is the smallest reference-runnable
    # scaled-down point.
    config.mcts.num_simulations = 100
    config.tournament.num_simulations = 100
    config.tournament.rounds = 1
    config.training.save_interval = 100  # skip checkpoint IO in the timing
    config.logging.use_tensorboard = False

    pipe = AlphaZeroPipeline(config)
    t0 = time.time()
    pipe.train()
    elapsed = time.time() - t0
    return {"config": "4 games/iter, 100 sims, 5x128 net, 1 tournament round",
            "iterations": 2, "total_s": round(elapsed, 1),
            "sec_per_iteration": round(elapsed / 2, 1)}


STAGES = [("env_stepping", measure_env),
          ("mcts_sweep_sims100", measure_mcts_sweep),
          ("mcts_flagship_400sims", measure_flagship),
          ("pipeline_tiny", measure_pipeline)]

# resume: skip stages already measured successfully
if os.path.exists(OUT):
    with open(OUT) as f:
        prev = json.load(f)
    RESULTS.update(prev)
    STAGES = [(n, f_) for n, f_ in STAGES
              if not isinstance(RESULTS.get(n), (dict, list))
              or (isinstance(RESULTS.get(n), dict) and "error" in RESULTS[n])]

for name, fn in STAGES:
    log(f"=== {name} ===")
    t0 = time.time()
    try:
        RESULTS[name] = fn()
        log(f"{name} done in {time.time() - t0:.1f}s: {RESULTS[name]}")
    except Exception as e:  # record the failure, keep going
        import traceback
        traceback.print_exc()
        RESULTS[name] = {"error": repr(e)}
    save()
log("ALL DONE")
