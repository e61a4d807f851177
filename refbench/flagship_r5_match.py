#!/usr/bin/env python
"""Round-5 flagship strength-chain match: training state at iteration A vs
iteration B of the r5 run (plus an anti-random sanity arm).

Same protocol as refbench/flagship_r4_match2.py (noise-free PUCT both
sides, colors half/half, 200 games default) so r4/r5 chains are
comparable; the r5 run directory rebuilds the trained flagship model on
this host (refbench/flagship_r5_run.py).

Usage: python refbench/flagship_r5_match.py <it_a> <it_b> [out_name] [run]
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from alphazero_reversi_tpu import checkpoint as ckpt_lib  # noqa: E402
from alphazero_reversi_tpu.arena import play_pair  # noqa: E402
from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.models import resnet  # noqa: E402
from alphazero_reversi_tpu.pipeline import make_checkpoint_template  # noqa: E402

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
    it_a = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    it_b = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    out_name = sys.argv[3] if len(sys.argv) > 3 else "flagship_r5_match"
    run = sys.argv[4] if len(sys.argv) > 4 else \
        "/root/repo/runs_flagship/run_r5"

    cfg = Config.load(os.path.join(run, "config.json"))
    template = make_checkpoint_template(cfg)
    net = resnet.build_network(cfg.model)
    net_template = resnet.init_variables(net, jax.random.PRNGKey(0))

    def state_variables(it: int) -> dict:
        tree = ckpt_lib.restore_checkpoint(
            os.path.join(run, "checkpoints", f"it_{it:06d}"), template)
        state = tree["state"]
        return {"params": state.params, "batch_stats": state.batch_stats}

    va, vb = state_variables(it_a), state_variables(it_b)
    results = {"protocol": {
        "games_per_pairing": GAMES, "sims": SIMS, "temperature": TEMP,
        "searcher": "noise-free PUCT both sides (arena.play_pair), colors "
                    "split half/half",
        "run": run,
        "arms": f"training state at it_{it_b:06d} and it_{it_a:06d}"}}

    base = jax.random.PRNGKey(time.time_ns() % (2 ** 31))
    pairings = [
        (f"it{it_a}_vs_it{it_b}", va, vb, False),
        (f"it{it_a}_vs_random", va, None, True),
    ]
    for i, (name, a, b, b_random) in enumerate(pairings):
        t0 = time.time()
        scores = play_pair(
            net, a, b if b is not None else net_template,
            jax.random.fold_in(base, i), num_games=GAMES,
            num_simulations=SIMS, c_puct=1.0, temperature=TEMP,
            b_random=b_random)
        rec = record(np.asarray(scores))
        rec["seconds"] = round(time.time() - t0, 1)
        results[name] = rec
        print(name, json.dumps(rec), flush=True)

    out = os.path.join(HERE, f"{out_name}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
