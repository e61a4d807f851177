#!/usr/bin/env python
"""Measure THIS framework at the reference's matched tiny operating point
(the other half of VERDICT item 3 — refbench/measure_reference.py measured
the reference; this gives the repo-vs-reference ratio for BASELINE.md).

Matched config == measure_reference.measure_pipeline: 4 games/iter,
100 sims, 5x128 net, train batch 64, 1 tournament round, no checkpoint IO,
no TensorBoard. Reference result: 65.9 s/iteration (2 iterations, CPU).

Reports cold (first 2 iterations, includes XLA compiles) and warm (next 2,
steady state) per-iteration wall time. Runs on whatever backend JAX picks —
the TPU chip by default, the honest deployment comparison (one v5e chip vs
the single CPU core the torch reference gets on this machine); set
JAX_PLATFORMS=cpu for a same-silicon curiosity number.

Also measures our env on the SAME protocol as the reference's env number
(single game loop on the host API, CPU-friendly) for an apples-to-apples
engine comparison, in addition to bench.py's batched-TPU headline.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

HERE = os.path.dirname(os.path.abspath(__file__))
WORKDIR = os.path.join(HERE, "workdir_repo")
OUT = os.path.join(HERE, "repo_measurements.json")
os.makedirs(WORKDIR, exist_ok=True)
os.chdir(WORKDIR)

RESULTS = {}


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)


def measure_pipeline():
    import jax
    from alphazero_reversi_tpu.config import Config
    from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline

    config = Config()
    config.mcts.num_simulations = 100
    config.self_play.num_games = 4
    config.self_play.num_parallel_games = 4
    config.training.num_epochs = 4
    config.training.batch_size = 64
    config.training.save_interval = 100
    config.tournament.num_simulations = 100
    config.tournament.rounds = 1
    config.logging.save_checkpoints = False
    config.logging.use_tensorboard = False
    config.logging.verbose = False

    pipe = AlphaZeroPipeline(config, run_name="measure")
    t0 = time.time()
    pipe.train(num_iterations=2)
    cold = time.time() - t0
    t0 = time.time()
    pipe.train(num_iterations=4)
    warm = time.time() - t0
    dev = jax.devices()[0]
    return {
        "config": "4 games/iter, 100 sims, 5x128 net, 1 tournament round "
                  "(matched to reference_measurements.json pipeline_tiny)",
        "backend": f"{dev.platform} {getattr(dev, 'device_kind', '?')}",
        "cold_2iter_s": round(cold, 1),
        "cold_sec_per_iteration": round(cold / 2, 1),
        "warm_2iter_s": round(warm, 1),
        "warm_sec_per_iteration": round(warm / 2, 1),
    }


def measure_env_hostloop():
    """The reference's env protocol (greedy 100k-move loop, one board at a
    time through the host OO API) on our engine — same-shape work, so the
    ratio is engine speed, not batching."""
    from alphazero_reversi_tpu.env.oracle import MODE_COMPAT, OracleBoard

    num_moves = 100_000
    board = OracleBoard(mode=MODE_COMPAT)
    move_count = 0
    t0 = time.time()
    while move_count < num_moves:
        if board.game_over:
            board = OracleBoard(mode=MODE_COMPAT)
        moves = board.get_valid_moves()
        if moves:
            board.make_move(*moves[0])
        else:
            board.make_move(-1, -1)
        move_count += 1
    elapsed = time.time() - t0
    return {"num_moves": num_moves, "elapsed_s": round(elapsed, 3),
            "moves_per_s": round(num_moves / elapsed, 1),
            "engine": "native C oracle via ctypes (host OO API, 1 board)"}


for name, fn in [("env_hostloop", measure_env_hostloop),
                 ("pipeline_tiny", measure_pipeline)]:
    print(f"=== {name} ===", flush=True)
    t0 = time.time()
    try:
        RESULTS[name] = fn()
    except Exception as e:  # record and continue
        RESULTS[name] = {"error": repr(e)}
    print(json.dumps(RESULTS[name]), flush=True)
    save()
