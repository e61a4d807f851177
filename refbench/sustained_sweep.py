#!/usr/bin/env python
"""Sustained-throughput sweep (VERDICT item 1b, honest-dispatch edition).

Runs bench_mcts_sustained over the operating-point grid and appends one
JSON line per cell to refbench/sustained_tpu.json(l). See
benchmarks.bench_mcts_sustained for why this measurement (N moves inside
one program) rather than per-dispatch timing is the deployment number.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from alphazero_reversi_tpu import benchmarks

CELLS = [
    # (blocks, filters, name, sims, leaf_batch, moves)
    (1, 16, "tiny-1x16", 32, 8, 16),
    (1, 16, "tiny-1x16", 32, 16, 16),
    (1, 16, "tiny-1x16", 32, 32, 16),
    (1, 16, "tiny-1x16", 100, 4, 8),
    (1, 16, "tiny-1x16", 100, 10, 8),
    (5, 128, "flagship-5x128", 100, 4, 8),
    (5, 128, "flagship-5x128", 400, 8, 4),
]

out_path = "/root/repo/refbench/sustained_tpu.jsonl"
for blocks, filters, name, sims, lb, moves in CELLS:
    t0 = time.time()
    try:
        row = benchmarks.bench_mcts_sustained(
            batch=1024, num_simulations=sims, moves=moves,
            num_res_blocks=blocks, num_filters=filters,
            leaf_batch=lb, repeats=3)
    except Exception as e:  # keep sweeping on a single-cell failure
        row = {"error": repr(e), "sims": sims, "leaf_batch": lb}
    row["net"] = name
    row["total_cell_s"] = round(time.time() - t0, 1)
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
