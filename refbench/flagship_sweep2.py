#!/usr/bin/env python
import json, sys, time
sys.path.insert(0, "/root/repo")
from alphazero_reversi_tpu import benchmarks
OUT = "/root/repo/refbench/flagship_sweep.jsonl"
for lb, md in [(40, 24), (8, 16), (16, 16), (16, 12)]:
    t0 = time.time()
    row = benchmarks.bench_mcts_sustained(1024, 400, moves=4, leaf_batch=lb, max_depth=md)
    row["max_depth"] = md
    row["total_cell_s"] = round(time.time() - t0, 1)
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
