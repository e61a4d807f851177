#!/usr/bin/env python
"""Extended-flagship match: does training past iteration 47 keep buying
strength?

Round-3 extension: the flagship run (configs/flagship_run.json) was resumed
from it_000047 with a stepped-up LR schedule
(refbench/flagship_run/resume3_config.json: lr 1e-4 until it 120, then 1e-5)
through iteration 160 — affordable only because of the r3 dispatch-count
work (~13 s/iteration warm, PERF.md "Scanned multi-step SGD").

Pairings (batched device arena, ``arena.play_pair``, SAME noise-free
PUCT-100 searcher both sides, temperature 0.1, colors split half/half —
the flagship_match.py protocol):

* ext (it-160 best) vs pre-extension best (it-47 snapshot,
  refbench/flagship_run/snap_it47/) — the headline: more iterations at the
  designed operating point keep improving the model.
* ext vs both 30-iteration tiny-config checkpoints (ours + the reference's
  imported one) — continuity with the r3 flagship_match.json table.
* ext vs random — sanity anchor.

Outputs refbench/flagship_ext_match.json.
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from alphazero_reversi_tpu import checkpoint as ckpt_lib
from alphazero_reversi_tpu import interop
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
    if not runs:
        raise SystemExit("no flagship run found")
    ext_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        runs[-1], "checkpoints")

    net = resnet.build_network(ModelConfig())
    template = resnet.init_variables(net, jax.random.PRNGKey(0))
    ext = ckpt_lib.restore_best(ext_dir, template)
    it47 = ckpt_lib.restore_best(
        os.path.join(HERE, "flagship_run", "snap_it47"), template)
    ours30 = ckpt_lib.restore_best(
        os.path.join(HERE, "workdir_repo_train30", "checkpoints"), template)
    ref30, _ = interop.import_torch_checkpoint(
        os.path.join(HERE, "workdir_train30", "checkpoints",
                     "best_model.pth"))

    results = {"protocol": {
        "games_per_pairing": GAMES, "sims": SIMS, "temperature": TEMP,
        "searcher": "noise-free PUCT both sides (arena.play_pair), colors "
                    "split half/half",
        "ext_ckpt": ext_dir,
        "ext_config": "refbench/flagship_run/resume3_config.json "
                      "(resume it47 -> it160, lr 1e-4 then 1e-5 at it120)",
        "it47_ckpt": "refbench/flagship_run/snap_it47 (pre-extension best, "
                     "the r3 flagship_match.json subject)"}}

    base = jax.random.PRNGKey(time.time_ns() % (2 ** 31))
    pairings = [
        ("ext_vs_it47", ext, it47, False),
        ("ext_vs_ours30", ext, ours30, False),
        ("ext_vs_ref30", ext, ref30, False),
        ("ext_vs_random", ext, None, True),
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

    out = os.path.join(HERE, "flagship_ext_match.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
