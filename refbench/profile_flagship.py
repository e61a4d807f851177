#!/usr/bin/env python
"""Trace one flagship search (B=1024, 400 sims, leaf_batch=8, 5x128 bf16)
on the real TPU and print the per-op-category time breakdown of a
simulation round. Parses the xplane-exported trace.json.gz directly."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from alphazero_reversi_tpu.config import ModelConfig
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.mcts import search as search_lib

TRACE = "/tmp/mcts_trace_ml8"


def main():
    batch = int(os.environ.get("B", 1024))
    sims = int(os.environ.get("SIMS", 400))
    lb = int(os.environ.get("LB", 8))
    cfg = ModelConfig(num_res_blocks=5, num_filters=128,
                      compute_dtype="bfloat16")
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    roots = env.initial_state((batch,))

    def run(k):
        r = search_lib.run_search(
            net, variables, roots, k, num_simulations=sims, c_puct=1.0,
            dirichlet_alpha=0.3, dirichlet_epsilon=0.25, leaf_batch=lb)
        return r.visit_counts

    print("compiling...", flush=True)
    np.asarray(run(jax.random.PRNGKey(int(time.time_ns()) % 2**31)))
    print("tracing...", flush=True)
    with jax.profiler.trace(TRACE):
        np.asarray(run(jax.random.PRNGKey(int(time.time_ns() + 1) % 2**31)))

    files = sorted(glob.glob(TRACE + "/plugins/profile/*/*.trace.json.gz"))
    assert files, "no trace produced"
    with gzip.open(files[-1], "rt") as f:
        t = json.load(f)
    events = [e for e in t["traceEvents"]
              if e.get("ph") == "X" and "dur" in e]
    # keep only TPU-device lanes (drop host python/runtime threads)
    pid_names = {}
    for e in t["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    if dev_pids:
        events = [e for e in events if e["pid"] in dev_pids]
    by_cat = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        name = e["name"]
        dur = e["dur"]  # us
        total += dur
        by_name[name] += dur
        key = name.split(".")[0].split("(")[0]
        by_cat[key] += dur
    print(f"\npids: { {p: pid_names.get(p) for p in set(e['pid'] for e in events)} }")
    print(f"total device time: {total/1e3:.2f} ms  ({len(events)} events)")
    print("\n== top 30 op names ==")
    for n, d in sorted(by_name.items(), key=lambda x: -x[1])[:30]:
        print(f"{d/1e3:9.2f} ms  {d/total*100:5.1f}%  {n[:110]}")


if __name__ == "__main__":
    main()
