#!/usr/bin/env python
"""Second flagship extension match: iteration 300 vs iteration 168.

The flagship run was extended again (refbench/flagship_run/resume6_config.json:
it 168 -> 300 at lr 1e-5, ~16 s/iteration warm with the r3 dispatch-count and
host-fetch checkpoint work). This harness asks whether 132 more iterations at
the flat 1e-5 tail still buy strength, against the strongest previous
snapshot (it-168, refbench/flagship_run/snap_it168/ — the resume5 endpoint).

Protocol identical to flagship_ext_match.py / flagship_match.py: batched
device arena (``arena.play_pair``), SAME noise-free PUCT-100 searcher both
sides, temperature 0.1, colors split half/half, 200 games per pairing.

Outputs refbench/flagship_ext2_match.json.
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from alphazero_reversi_tpu import checkpoint as ckpt_lib
from alphazero_reversi_tpu.arena import play_pair
from alphazero_reversi_tpu.config import ModelConfig
from alphazero_reversi_tpu.models import resnet

HERE = os.path.dirname(os.path.abspath(__file__))
GAMES = int(os.environ.get("AZR_MATCH_GAMES", "200"))
SIMS = int(os.environ.get("AZR_MATCH_SIMS", "100"))
TEMP = float(os.environ.get("AZR_MATCH_TEMP", "0.1"))


def record(scores_a: np.ndarray) -> dict:
    w = int((scores_a == 1.0).sum())
    d = int((scores_a == 0.5).sum())
    losses = int((scores_a == 0.0).sum())
    n = len(scores_a)
    score = (w + 0.5 * d) / n
    s = min(max(score, 1.0 / (4 * n)), 1 - 1.0 / (4 * n))
    return {"games": n, "w": w, "d": d, "l": losses,
            "score": round(score, 4),
            "elo_diff": round(400 * math.log10(s / (1 - s)), 1)}


def main():
    import glob

    runs = sorted(glob.glob("/root/repo/runs_flagship/run_*"))
    ext_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        runs[-1], "checkpoints")

    net = resnet.build_network(ModelConfig())
    template = resnet.init_variables(net, jax.random.PRNGKey(0))
    ext300 = ckpt_lib.restore_best(ext_dir, template)
    # snap_it168 is the FULL it_000168 checkpoint tree (not a best_model
    # dir): restore it and take its best_variables leaf
    from alphazero_reversi_tpu.config import Config
    from alphazero_reversi_tpu.pipeline import make_checkpoint_template
    cfg168 = Config.load(
        os.path.join(HERE, "flagship_run", "resume5_config.json"))
    tree168 = ckpt_lib.restore_checkpoint(
        os.path.join(HERE, "flagship_run", "snap_it168"),
        make_checkpoint_template(cfg168))
    it168 = tree168["best_variables"]
    it47 = ckpt_lib.restore_best(
        os.path.join(HERE, "flagship_run", "snap_it47"), template)
    for name, arm in [("ext300", ext300), ("it168", it168), ("it47", it47)]:
        if arm is None:  # a None arm silently becomes random-init weights
            raise SystemExit(f"arm {name} failed to load")

    results = {"protocol": {
        "games_per_pairing": GAMES, "sims": SIMS, "temperature": TEMP,
        "searcher": "noise-free PUCT both sides (arena.play_pair), colors "
                    "split half/half",
        "ext300_ckpt": ext_dir,
        "ext300_config": "refbench/flagship_run/resume6_config.json "
                         "(resume it168 -> it300, lr 1e-5; the run's final "
                         "device fetch hung on the relay so the endpoint "
                         "is the it-299 best_model promotion, elo 1337)",
        "it168_ckpt": "refbench/flagship_run/snap_it168 (resume5 endpoint, "
                      "the strongest pre-extension snapshot)"}}

    base = jax.random.PRNGKey(time.time_ns() % (2 ** 31))
    pairings = [
        ("ext300_vs_it168", ext300, it168, False),
        ("ext300_vs_it47", ext300, it47, False),
        ("ext300_vs_random", ext300, None, True),
    ]
    for i, (name, va, vb, b_random) in enumerate(pairings):
        t0 = time.time()
        scores = play_pair(
            net, va, vb if vb is not None else template,
            jax.random.fold_in(base, i), num_games=GAMES,
            num_simulations=SIMS, c_puct=1.0, temperature=TEMP,
            b_random=b_random)
        rec = record(np.asarray(scores))
        rec["seconds"] = round(time.time() - t0, 1)
        results[name] = rec
        print(name, json.dumps(rec), flush=True)

    out = os.path.join(HERE, "flagship_ext2_match.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
