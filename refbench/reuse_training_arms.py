#!/usr/bin/env python
"""Controlled training-level A/B of self-play tree reuse (VERDICT r4
item 4, pipeline leg): continue the r5 flagship run from it-250 for N more
iterations twice — one arm with ``mcts.tree_reuse="root"`` (+ the
tournament gate reusing too), one arm unchanged — then match the two final
models under a NEUTRAL protocol (noise-free cold PUCT-100 both sides, so
neither arm's matches use reuse; this compares the learned weights only).

The search-level value of reuse is established by the direct asymmetric
matches (+155 ELO at Gumbel-32 equal sims, refbench/reuse_strength.json);
this leg checks the pipeline-level story — reused-search self-play changes
the training data (played lines AND sigma-informed policy targets), so the
flagship config should only flip the default if training through it does
not regress.

Usage: python refbench/reuse_training_arms.py [extra_iters] [games]
Writes refbench/reuse_training_arms.json.
"""
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from alphazero_reversi_tpu import checkpoint as ckpt_lib  # noqa: E402
from alphazero_reversi_tpu.arena import play_pair  # noqa: E402
from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.models import resnet  # noqa: E402
from alphazero_reversi_tpu.pipeline import (AlphaZeroPipeline,  # noqa: E402
                                            make_checkpoint_template)

HERE = os.path.dirname(os.path.abspath(__file__))
BASE = "/root/repo/runs_flagship/run_r5"
START_IT = 250
EXTRA = int(sys.argv[1]) if len(sys.argv) > 1 else 40
GAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 400


def record(scores_a: np.ndarray) -> dict:
    w = int((scores_a == 1.0).sum())
    d = int((scores_a == 0.5).sum())
    losses = int((scores_a == 0.0).sum())
    n = len(scores_a)
    score = (w + 0.5 * d) / n
    s = min(max(score, 1.0 / (4 * n)), 1 - 1.0 / (4 * n))
    se = math.sqrt(max(score * (1 - score), 1e-9) / n)
    return {"games": n, "w": w, "d": d, "l": losses,
            "score": round(score, 4),
            "elo_diff": round(400 * math.log10(s / (1 - s)), 1),
            "elo_ci95": round(
                1.96 * se * 400 / (math.log(10) * max(s * (1 - s), 1e-9)),
                1)}


def run_arm(name: str, reuse: bool) -> str:
    outdir = f"/root/repo/runs_flagship/arm_{name}"
    ckdir = os.path.join(outdir, "checkpoints")
    os.makedirs(ckdir, exist_ok=True)
    src = os.path.join(BASE, "checkpoints", f"it_{START_IT:06d}")
    dst = os.path.join(ckdir, f"it_{START_IT:06d}")
    if not os.path.exists(dst):
        shutil.copytree(src, dst)

    cfg = Config.load(os.path.join(BASE, "config.json"))
    cfg.training.num_epochs = START_IT + EXTRA
    cfg.training.checkpoint_dir = ckdir
    cfg.self_play.save_dir = os.path.join(outdir, "self_play_data")
    cfg.logging.log_dir = os.path.join(outdir, "logs")
    cfg.logging.save_best_only = True  # only the final/best matter here
    if reuse:
        cfg.mcts.tree_reuse = "root"
        cfg.tournament.tree_reuse = "root"
    cfg.save(os.path.join(outdir, "config.json"))

    pipe = AlphaZeroPipeline(cfg, run_name=f"arm_{name}")
    assert pipe.load_checkpoint(), f"arm {name}: restore failed"
    print(f"arm {name}: resumed at it {pipe.iteration}, reuse={reuse}",
          flush=True)
    t0 = time.time()
    pipe.train()
    wall = time.time() - t0
    print(f"arm {name}: {EXTRA} its in {wall:.0f}s "
          f"({wall / EXTRA:.1f}s/it)", flush=True)
    return outdir


def final_variables(outdir: str, cfg_path: str) -> dict:
    cfg = Config.load(cfg_path)
    template = make_checkpoint_template(cfg)
    tree = ckpt_lib.restore_checkpoint(
        os.path.join(outdir, "checkpoints",
                     f"it_{START_IT + EXTRA:06d}"), template)
    state = tree["state"]
    return {"params": state.params, "batch_stats": state.batch_stats}


def main():
    dir_r = run_arm("reuse", True)
    dir_c = run_arm("cold", False)

    cfg = Config.load(os.path.join(BASE, "config.json"))
    net = resnet.build_network(cfg.model)
    va = final_variables(dir_r, os.path.join(dir_r, "config.json"))
    vb = final_variables(dir_c, os.path.join(dir_c, "config.json"))

    results = {"protocol": {
        "base": BASE, "start_it": START_IT, "extra_iters": EXTRA,
        "games": GAMES,
        "arms": "A trained it250->%d WITH self-play+gate tree reuse, B "
                "same window without; matched with cold noise-free "
                "PUCT-100 both sides (neutral: no reuse in the match)"
                % (START_IT + EXTRA)}}
    t0 = time.time()
    scores = play_pair(
        net, va, vb, jax.random.PRNGKey(time.time_ns() % (2 ** 31)),
        num_games=GAMES, num_simulations=100, c_puct=1.0, temperature=0.1)
    rec = record(np.asarray(scores))
    rec["seconds"] = round(time.time() - t0, 1)
    results["reuse_arm_vs_cold_arm"] = rec
    print("reuse_arm_vs_cold_arm", json.dumps(rec), flush=True)

    out = os.path.join(HERE, "reuse_training_arms.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
