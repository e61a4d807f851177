#!/usr/bin/env python
"""Ground-truth validation of the promotion gate (VERDICT r3 item 7).

The pipeline promotes a model when its fresh-arena ELO beats the current
best's (pipeline._evaluate_model). This script checks that those internal
decisions track REAL strength, using the round-4 flagship history
(refbench/flagship_r4_run.py: a checkpoint per iteration, each carrying both
the just-trained ``state`` and the ``best_variables`` the gate compared it
against):

* at the LAST PROMOTION iteration p: match current(p) vs the best BEFORE the
  decision (checkpoint it_p's best_variables). The gate said "stronger" —
  ground truth should score > 0.5.
* at the LAST REJECTION iteration r: match current(r) vs the best it lost to
  (checkpoint it_{r+1}'s best_variables, unchanged through r). The gate said
  "not stronger" — ground truth should score <= ~0.5 + noise.

Protocol: the crossplay/flagship-match protocol (noise-free PUCT, 100 sims,
temperature 0.1, colors half/half, one jitted program per match).

Usage: python refbench/promotion_gate_check.py <run_dir> [games]
Writes refbench/promotion_gate_check.json.
"""
import json
import math
import os
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from alphazero_reversi_tpu import checkpoint as ckpt_lib  # noqa: E402
from alphazero_reversi_tpu import learner as learner_lib  # noqa: E402
from alphazero_reversi_tpu import replay as replay_lib  # noqa: E402
from alphazero_reversi_tpu.arena import play_pair  # noqa: E402
from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.models import resnet  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
GAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 200
SIMS = 100
TEMP = 0.1


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
    run_dir = sys.argv[1]
    cfg = Config.load(os.path.join(run_dir, "config.json"))
    metrics = [json.loads(line) for line in
               open(os.path.join(run_dir, "metrics.jsonl"))]
    promoted = [m["iteration"] for m in metrics if m["eval/promoted"]]
    rejected = [m["iteration"] for m in metrics if not m["eval/promoted"]]
    if not promoted or not rejected:
        raise SystemExit(f"need both decisions; promoted={len(promoted)} "
                         f"rejected={len(rejected)}")
    p, r = promoted[-1], rejected[-1]

    from alphazero_reversi_tpu.pipeline import make_checkpoint_template

    net = resnet.build_network(cfg.model)
    template = make_checkpoint_template(cfg)
    ckpt_dir = cfg.training.checkpoint_dir

    def load(it):
        tree = ckpt_lib.restore_checkpoint(
            ckpt_lib.checkpoint_path(ckpt_dir, it), template)
        state = tree["state"]
        cur = {"params": state.params if hasattr(state, "params")
               else state[0],
               "batch_stats": state.batch_stats if hasattr(state, "params")
               else state[1]}
        return cur, tree["best_variables"]

    # checkpoint it_{k+1} holds state AFTER iteration k (the model the gate
    # judged at k) and best_variables AFTER k's decision; it_k's
    # best_variables is the best BEFORE k's decision
    cur_p, _ = load(p + 1)
    _, best_before_p = load(p)
    cur_r, best_at_r = load(r + 1)

    def match(a, b, seed):
        scores = play_pair(
            net, a, b, jax.random.PRNGKey(seed), num_games=GAMES,
            num_simulations=SIMS, c_puct=1.0, temperature=TEMP,
            a_random=False, b_random=False, max_depth=24)
        return record(np.asarray(scores))

    out = {
        "run_dir": run_dir, "games_per_match": GAMES, "sims": SIMS,
        "temperature": TEMP,
        "promotion_iteration": p,
        "promoted_vs_prior_best": match(cur_p, best_before_p, 101),
        "rejection_iteration": r,
        "rejected_vs_then_best": match(cur_r, best_at_r, 202),
    }
    out["gate_consistent"] = (
        out["promoted_vs_prior_best"]["score"] > 0.5
        and out["rejected_vs_then_best"]["score"]
        <= out["promoted_vs_prior_best"]["score"])
    path = os.path.join(HERE, "promotion_gate_check.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
