#!/usr/bin/env python
"""Flagship operating-point sweep: sustained moves/s at B=1024, 400 sims,
5x128 bf16, over leaf_batch x max_depth. Writes JSONL."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from alphazero_reversi_tpu import benchmarks

OUT = "/root/repo/refbench/flagship_sweep.jsonl"


def main():
    cells = [(8, 24), (16, 24), (32, 24), (8, 16), (16, 16)]
    for lb, md in cells:
        t0 = time.time()
        row = benchmarks.bench_mcts_sustained(
            1024, 400, moves=4, leaf_batch=lb, max_depth=md)
        row["max_depth"] = md
        row["total_cell_s"] = round(time.time() - t0, 1)
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
