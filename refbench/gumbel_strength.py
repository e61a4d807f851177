#!/usr/bin/env python
"""Gumbel-vs-PUCT strength at matched small budgets (mcts/gumbel.py).

The claim under test (Danihelka et al. 2022): Gumbel sequential-halving
search retains AlphaZero's policy improvement at simulation budgets where
classic PUCT degrades — so at the framework's fast operating points
(16-32 sims, where the TPU search peaks at 94k-221k moves/s, PERF.md) the
*effective* strength-per-second multiplies.

Protocol: the 30-iteration trained flagship checkpoint
(refbench/workdir_repo_train30, refbench/train_repo.py) plays against
itself — identical weights, different search per side — via the arena's
per-side settings (arena.play_pair algorithm/algorithm_b,
num_simulations_b). Colors alternate across each batch. Temperature 0.1
both sides; seeds recorded in the output JSON.

Run on CPU (set AZR_CPU=1) or TPU. Results -> gumbel_strength.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if os.environ.get("AZR_CPU", "1") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, "workdir_repo_train30", "checkpoints")
OUT = os.path.join(HERE, os.environ.get("AZR_MATCH_OUT",
                                        "gumbel_strength.json"))

from alphazero_reversi_tpu import arena  # noqa: E402
from alphazero_reversi_tpu import checkpoint as ckpt_lib  # noqa: E402
from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.models import resnet  # noqa: E402

GAMES = int(os.environ.get("AZR_GAMES", "16"))
SEED = int(os.environ.get("AZR_SEED", "17"))

config = Config()  # flagship 5x128 — matches the training run
net = resnet.build_network(config.model)
template = resnet.init_variables(net, jax.random.PRNGKey(0))
variables = ckpt_lib.restore_best(CKPT, template)
assert variables is not None, f"no best checkpoint under {CKPT}"

matches = [
    # (tag, A settings, B settings) — A is always gumbel
    ("gumbel32_vs_puct32", 32, 32),
    ("gumbel32_vs_puct100", 32, 100),
    ("gumbel16_vs_puct100", 16, 100),
]

results = {"games_per_match": GAMES, "seed": SEED,
           "checkpoint": CKPT, "matches": {}}
key = jax.random.PRNGKey(SEED)
for tag, sims_a, sims_b in matches:
    key, mkey = jax.random.split(key)
    t0 = time.time()
    scores = np.asarray(arena.play_pair(
        net, variables, variables, mkey,
        num_games=GAMES, num_simulations=sims_a, c_puct=config.mcts.c_puct,
        temperature=0.1, max_depth=24,
        algorithm="gumbel", algorithm_b="puct",
        num_simulations_b=sims_b))
    wins = float((scores == 1.0).sum())
    draws = float((scores == 0.5).sum())
    losses = float((scores == 0.0).sum())
    p = scores.mean()
    elo = 400.0 * np.log10(max(p, 1e-3) / max(1.0 - p, 1e-3)) if GAMES else 0.0
    rec = {"gumbel_sims": sims_a, "puct_sims": sims_b,
           "wins": wins, "draws": draws, "losses": losses,
           "score": float(p), "elo_diff": float(elo),
           "seconds": round(time.time() - t0, 1)}
    results["matches"][tag] = rec
    print(tag, rec, flush=True)

with open(OUT, "w") as f:
    json.dump(results, f, indent=2)
print("wrote", OUT)
