#!/usr/bin/env python
"""Strength cost of multi-leaf search rounds (the `leaf_batch` knob).

`leaf_batch` trades search quality (in-round descents see frozen deep
stats, diversified only by root virtual loss) for throughput (every
per-round full-pass cost amortizes over L leaves; PERF.md v5/v8). This
study pins the quality side: head-to-head matches at EQUAL simulation
count between a leaf_batch=L searcher and the sequential leaf_batch=1
searcher, same net, colors alternated (`arena.play_pair` with per-side
search settings). A score near 0.5 means the throughput is ~free.

Runs on CPU (tiny net) by default so it can run without the TPU relay.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("AZR_QUALITY_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from alphazero_reversi_tpu import arena  # noqa: E402
from alphazero_reversi_tpu.config import ModelConfig  # noqa: E402
from alphazero_reversi_tpu.models import resnet  # noqa: E402

OUT = "/root/repo/refbench/leafbatch_quality.json"


def main():
    sims = int(os.environ.get("SIMS", 128))
    games = int(os.environ.get("GAMES", 64))
    temperature = float(os.environ.get("TAU", 0.25))
    ckpt = os.environ.get("AZR_QUALITY_CKPT", "")
    if ckpt:  # trained net (e.g. the 30-iteration parity checkpoint) on TPU
        cfg = ModelConfig()
        net = resnet.build_network(cfg)
        from alphazero_reversi_tpu import checkpoint as ckpt_lib

        template = resnet.init_variables(net, jax.random.PRNGKey(0))
        variables = ckpt_lib.restore_best(ckpt, template)
        assert variables is not None, f"no best checkpoint under {ckpt}"
        net_desc = f"trained {cfg.num_res_blocks}x{cfg.num_filters} ({ckpt})"
    else:
        cfg = ModelConfig(num_res_blocks=2, num_filters=32,
                          compute_dtype="float32")
        net = resnet.build_network(cfg)
        variables = resnet.init_variables(net, jax.random.PRNGKey(42))
        net_desc = (f"{cfg.num_res_blocks}x{cfg.num_filters} random init "
                    f"seed 42 — quality RATIO between searchers, not "
                    f"absolute strength")

    results = {"protocol": {
        "sims": sims, "games_per_cell": games, "temperature": temperature,
        "net": net_desc,
        "scoring": "score of the leaf_batch=L side vs leaf_batch=1, "
                   "colors alternated, equal sims",
    }, "cells": []}
    for L in (4, 8, 16):
        if sims % L:
            continue
        t0 = time.time()
        scores = np.asarray(arena.play_pair(
            net, variables, variables, jax.random.PRNGKey(1000 + L),
            num_games=games, num_simulations=sims, c_puct=1.0,
            temperature=temperature, leaf_batch=L, leaf_batch_b=1))
        s = float(scores.mean())
        cell = {"leaf_batch": L, "score_vs_lb1": round(s, 4),
                "wins": float((scores == 1.0).sum()),
                "draws": float((scores == 0.5).sum()),
                "losses": float((scores == 0.0).sum()),
                "elo_diff": round(400 * np.log10(max(s, 1e-6)
                                                 / max(1 - s, 1e-6)), 1),
                "seconds": round(time.time() - t0, 1)}
        results["cells"].append(cell)
        print(json.dumps(cell), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
