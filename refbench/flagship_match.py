#!/usr/bin/env python
"""Flagship-strength match table (VERDICT r3 item 1 'Done' criterion).

Plays the flagship-trained model (configs/flagship_run.json: 1024 games/iter,
Gumbel-32 self-play, exact-value relabeling, 5x128 bf16 net, 40 iterations on
the real chip) against BOTH 30-iteration tiny-config checkpoints — this
framework's (refbench/train_repo.py) and the reference's, imported through
interop — plus a random anchor.

Protocol: the batched device arena (``arena.play_pair``), SAME searcher both
sides (noise-free PUCT, 100 sims, temperature 0.1 — the crossplay protocol,
refbench/crossplay.py), colors split half/half inside the batch. This
isolates MODEL strength; the search-engine comparison lives in crossplay.py.
All ``GAMES`` games of a pairing run as one jitted program on the chip.

Outputs refbench/flagship_match.json.
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


def load_ours(ckpt_dir, net, template):
    restored = ckpt_lib.restore_best(ckpt_dir, template)
    if restored is None:
        raise FileNotFoundError(f"no best model under {ckpt_dir}")
    return restored


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
    flagship_dir = sys.argv[1] if len(sys.argv) > 1 else None
    if flagship_dir is None:
        import glob

        runs = sorted(glob.glob("/root/repo/runs_flagship/run_*"))
        if not runs:
            raise SystemExit("no flagship run found")
        flagship_dir = os.path.join(runs[-1], "checkpoints")

    net = resnet.build_network(ModelConfig())
    template = resnet.init_variables(net, jax.random.PRNGKey(0))
    flagship = load_ours(flagship_dir, net, template)
    ours30 = load_ours(os.path.join(HERE, "workdir_repo_train30",
                                    "checkpoints"), net, template)
    ref30, _ = interop.import_torch_checkpoint(
        os.path.join(HERE, "workdir_train30", "checkpoints",
                     "best_model.pth"))

    results = {"protocol": {
        "games_per_pairing": GAMES, "sims": SIMS, "temperature": TEMP,
        "searcher": "noise-free PUCT both sides (arena.play_pair), colors "
                    "split half/half", "flagship_ckpt": flagship_dir,
        "flagship_config": "configs/flagship_run.json (Gumbel-32 self-play, "
                           "exact_value_empties=12, 40 iters, real chip)"}}

    base = jax.random.PRNGKey(time.time_ns() % (2 ** 31))
    pairings = [
        ("flagship_vs_ours30", flagship, ours30, False),
        ("flagship_vs_ref30", flagship, ref30, False),
        ("flagship_vs_random", flagship, None, True),
        ("ours30_vs_ref30", ours30, ref30, False),  # consistency anchor
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

    out = os.path.join(HERE, "flagship_match.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
