#!/usr/bin/env python
"""Head-to-head: the exact-value-trained checkpoint vs the baseline.

Both arms trained 30 iterations at the IDENTICAL config and seed
(refbench/train_repo.py); the only difference is
``selfplay.exact_value_empties=12`` in the solver arm — late self-play
positions got ground-truth value labels from the native endgame solver
instead of the realized outcome. Both sides EVALUATE with the same plain
PUCT search (no solver at play time), so the match isolates what the value
head *learned*. Results -> solver_train_match.json.
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
CKPT_S = os.path.join(HERE, "workdir_repo_solver30", "checkpoints")
CKPT_P = os.path.join(HERE, "workdir_repo_train30", "checkpoints")
OUT = os.path.join(HERE, "solver_train_match.json")

from alphazero_reversi_tpu import arena  # noqa: E402
from alphazero_reversi_tpu import checkpoint as ckpt_lib  # noqa: E402
from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.models import resnet  # noqa: E402

GAMES = int(os.environ.get("AZR_GAMES", "32"))
SIMS = int(os.environ.get("AZR_MATCH_SIMS", "100"))
SEED = int(os.environ.get("AZR_SEED", "29"))

config = Config()
net = resnet.build_network(config.model)
template = resnet.init_variables(net, jax.random.PRNGKey(0))
vars_s = ckpt_lib.restore_best(CKPT_S, template)
vars_p = ckpt_lib.restore_best(CKPT_P, template)
assert vars_s is not None, f"no best checkpoint under {CKPT_S}"
assert vars_p is not None, f"no best checkpoint under {CKPT_P}"

t0 = time.time()
scores = np.asarray(arena.play_pair(
    net, vars_s, vars_p, jax.random.PRNGKey(SEED),
    num_games=GAMES, num_simulations=SIMS, c_puct=config.mcts.c_puct,
    temperature=0.1, max_depth=24))
p = float(scores.mean())
result = {
    "games": GAMES, "eval_search": f"puct-{SIMS} both sides, no solver",
    "seed": SEED,
    "exact_value_trained_wins": float((scores == 1.0).sum()),
    "draws": float((scores == 0.5).sum()),
    "losses": float((scores == 0.0).sum()),
    "score": p,
    "elo_diff": float(400.0 * np.log10(max(p, 1e-3) / max(1 - p, 1e-3))),
    "seconds": round(time.time() - t0, 1),
}
with open(OUT, "w") as f:
    json.dump(result, f, indent=2)
print(json.dumps(result, indent=2))
