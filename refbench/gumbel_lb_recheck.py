#!/usr/bin/env python
"""Re-measure the flagship Gumbel leaf_batch sweep (VERDICT r3 item 5).

The r3 table (PERF.md "flagship TRAINING cell") read lb1 16,956 / lb2
11,282 / lb4 16,371 moves/s — a non-monotone 33% dip at lb2 between two
near-equal neighbors, either measurement artifact or real effect. This
script re-runs the three cells TWICE each (independent fresh-key sustained
measurements, same protocol as refbench/sustained_sweep.py) so the dip
either reproduces (then PERF.md must explain it) or is replaced.

Usage: python refbench/gumbel_lb_recheck.py
Appends rows to refbench/gumbel_lb_recheck.jsonl and prints a summary.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from alphazero_reversi_tpu import benchmarks  # noqa: E402

OUT = "/root/repo/refbench/gumbel_lb_recheck.jsonl"

rows = []
for run in (1, 2):
    for lb in (1, 2, 4):
        t0 = time.time()
        try:
            row = benchmarks.bench_mcts_sustained(
                batch=1024, num_simulations=32, moves=16,
                num_res_blocks=5, num_filters=128, leaf_batch=lb,
                num_stages=4, algorithm="gumbel", repeats=3)
        except Exception as e:
            row = {"error": repr(e)}
        row.update({"net": "flagship-5x128", "run": run, "leaf_batch": lb,
                    "total_cell_s": round(time.time() - t0, 1)})
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
        rows.append(row)

print("\nsummary (moves/s):")
for lb in (1, 2, 4):
    vals = [r.get("moves_per_s") for r in rows
            if r["leaf_batch"] == lb and "moves_per_s" in r]
    print(f"  lb{lb}: {[round(v) for v in vals]}")
