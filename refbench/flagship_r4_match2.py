#!/usr/bin/env python
"""Round-4 flagship extension match: iteration 120 vs iteration 60.

The r4 flagship run (runs_flagship/run_r4_gate) was extended it-60 ->
it-120 through the round-4 packed-relabel + parallel-solver code
(~12 s/iteration warm; selfplay/seconds 6.5 -> 4.4). This harness asks
whether the second 60 iterations still buy strength, and re-anchors
against random.

Protocol identical to flagship_ext_match.py / flagship_r4_match.json
(it60-vs-it30): batched device arena (``arena.play_pair``), SAME
noise-free PUCT-100 searcher both sides, temperature 0.1, colors split
half/half, 200 games per pairing, model = the checkpoint's CURRENT
training state at that iteration.

Outputs refbench/flagship_r4_match2.json.
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
from alphazero_reversi_tpu.config import Config
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.pipeline import make_checkpoint_template

HERE = os.path.dirname(os.path.abspath(__file__))
RUN = "/root/repo/runs_flagship/run_r4_gate"
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


def state_variables(it: int, cfg: Config, template: dict) -> dict:
    tree = ckpt_lib.restore_checkpoint(
        os.path.join(RUN, "checkpoints", f"it_{it:06d}"), template)
    state = tree["state"]
    return {"params": state.params, "batch_stats": state.batch_stats}


def main():
    # optional argv: <it_a> <it_b> [out_name] — defaults to the original
    # 120-vs-60 match; later legs reuse the same protocol
    it_a = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    it_b = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    out_name = sys.argv[3] if len(sys.argv) > 3 else "flagship_r4_match2"

    cfg = Config.load(os.path.join(RUN, "config.json"))
    template = make_checkpoint_template(cfg)
    net = resnet.build_network(cfg.model)
    net_template = resnet.init_variables(net, jax.random.PRNGKey(0))

    va = state_variables(it_a, cfg, template)
    vb = state_variables(it_b, cfg, template)

    results = {"protocol": {
        "games_per_pairing": GAMES, "sims": SIMS, "temperature": TEMP,
        "searcher": "noise-free PUCT both sides (arena.play_pair), colors "
                    "split half/half",
        "run": RUN,
        "arms": f"training state at it_{it_b:06d} and it_{it_a:06d}"}}

    base = jax.random.PRNGKey(time.time_ns() % (2 ** 31))
    pairings = [
        (f"it{it_a}_vs_it{it_b}", va, vb, False),
        (f"it{it_a}_vs_random", va, None, True),
    ]
    for i, (name, va, vb, b_random) in enumerate(pairings):
        t0 = time.time()
        scores = play_pair(
            net, va, vb if vb is not None else net_template,
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
