#!/usr/bin/env python
"""Head-to-head: the Gumbel-32-trained checkpoint vs the PUCT-100-trained
checkpoint (both 30 iterations at the otherwise-matched config; training
runs: refbench/train_repo_gumbel.py vs refbench/train_repo.py /
workdir_repo_train30).

Both sides EVALUATE with the same search (PUCT, equal sims, temperature
0.1) so the match isolates the *training* difference — what the weights
learned — not the play-time algorithm. Results -> gumbel_train_match.json.
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
CKPT_G = os.path.join(HERE, "workdir_repo_gumbel", "checkpoints")
CKPT_P = os.path.join(HERE, "workdir_repo_train30", "checkpoints")
OUT = os.path.join(HERE, os.environ.get("AZR_MATCH_OUT",
                                        "gumbel_train_match.json"))

from alphazero_reversi_tpu import arena  # noqa: E402
from alphazero_reversi_tpu import checkpoint as ckpt_lib  # noqa: E402
from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.models import resnet  # noqa: E402

GAMES = int(os.environ.get("AZR_GAMES", "16"))
SIMS = int(os.environ.get("AZR_MATCH_SIMS", "32"))
SEED = int(os.environ.get("AZR_SEED", "23"))

config = Config()
net = resnet.build_network(config.model)
template = resnet.init_variables(net, jax.random.PRNGKey(0))
vars_g = ckpt_lib.restore_best(CKPT_G, template)
vars_p = ckpt_lib.restore_best(CKPT_P, template)
assert vars_g is not None, f"no best checkpoint under {CKPT_G}"
assert vars_p is not None, f"no best checkpoint under {CKPT_P}"

t0 = time.time()
scores = np.asarray(arena.play_pair(
    net, vars_g, vars_p, jax.random.PRNGKey(SEED),
    num_games=GAMES, num_simulations=SIMS, c_puct=config.mcts.c_puct,
    temperature=0.1, max_depth=24))
p = float(scores.mean())
result = {
    "games": GAMES, "eval_search": f"puct-{SIMS} both sides",
    "seed": SEED,
    "gumbel_trained_wins": float((scores == 1.0).sum()),
    "draws": float((scores == 0.5).sum()),
    "losses": float((scores == 0.0).sum()),
    "score": p,
    "elo_diff": float(400.0 * np.log10(max(p, 1e-3) / max(1 - p, 1e-3))),
    "seconds": round(time.time() - t0, 1),
}
with open(OUT, "w") as f:
    json.dump(result, f, indent=2)
print(json.dumps(result, indent=2))
