#!/usr/bin/env python
"""Tree-reuse strength + ceiling measurement (VERDICT r4 item 4).

Protocol (all on the real chip, flagship 5x128 bf16 net from the r5 run):

1. **Equal-sims strength**: asymmetric ``arena.play_pair`` matches — arm A
   searches with 1-level tree reuse (``tree_reuse="root"``: each side's
   next root warm-seeded from its previous search via the grandchild
   carry), arm B searches cold, both arms the SAME network and simulation
   budget. Cells: the pipeline's own eval operating point (Gumbel-32) and
   PUCT-100. Any score shift is the strength value of the carried
   evidence at equal search cost.
2. **Strength-per-cost**: reuse at a REDUCED budget (Gumbel-24) vs cold at
   the full 32 — does the carry buy back a 25% budget cut?
3. **Reuse ceiling**: sequential self-play-shaped decisions measuring the
   warm fraction — mean warm visits carried into each move's root as a
   fraction of the previous budget, per operating point. This bounds what
   ANY deeper (full-subtree) reuse could carry beyond level 1: the
   subtree below the played child holds at most (warm_visits - 1) nodes
   of structure, and at 32-sim Gumbel trees (depth ~2-4) level 1 IS most
   of the tree.

Usage: python refbench/reuse_strength.py [run_dir] [iteration] [games]
Writes refbench/reuse_strength.json.
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from alphazero_reversi_tpu import checkpoint as ckpt_lib  # noqa: E402
from alphazero_reversi_tpu import selfplay  # noqa: E402
from alphazero_reversi_tpu.arena import play_pair  # noqa: E402
from alphazero_reversi_tpu.config import Config  # noqa: E402
from alphazero_reversi_tpu.env import bitboard as env  # noqa: E402
from alphazero_reversi_tpu.mcts import gumbel as gumbel_lib  # noqa: E402
from alphazero_reversi_tpu.mcts import search as search_lib  # noqa: E402
from alphazero_reversi_tpu.mcts import tree as tree_lib  # noqa: E402
from alphazero_reversi_tpu.models import resnet  # noqa: E402
from alphazero_reversi_tpu.pipeline import make_checkpoint_template  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
RUN = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs_flagship/run_r5"
IT = int(sys.argv[2]) if len(sys.argv) > 2 else 250
GAMES = int(sys.argv[3]) if len(sys.argv) > 3 else 800


def record(scores_a: np.ndarray) -> dict:
    w = int((scores_a == 1.0).sum())
    d = int((scores_a == 0.5).sum())
    losses = int((scores_a == 0.0).sum())
    n = len(scores_a)
    score = (w + 0.5 * d) / n
    s = min(max(score, 1.0 / (4 * n)), 1 - 1.0 / (4 * n))
    se = math.sqrt(max(score * (1 - score), 1e-9) / n)
    # delta method: d(elo)/d(score) = 400 / (ln10 * s * (1-s))
    return {"games": n, "w": w, "d": d, "l": losses,
            "score": round(score, 4),
            "elo_diff": round(400 * math.log10(s / (1 - s)), 1),
            "elo_ci95": round(
                1.96 * se * 400 / (math.log(10) * max(s * (1 - s), 1e-9)),
                1)}


def warm_fraction(net, variables, *, algorithm: str, sims: int,
                  batch: int = 256, moves: int = 58, **search_kw) -> dict:
    """Sequential decisions with the self-play child-level carry, recording
    the mean warm fraction per move (the reuse ceiling instrumentation)."""
    states = env.initial_state((batch,))
    warm = (jnp.zeros((batch, env.NUM_ACTIONS), jnp.float32),
            jnp.zeros((batch, env.NUM_ACTIONS), jnp.float32))
    key = jax.random.PRNGKey(time.time_ns() % (2 ** 31))
    fracs, all_fracs, grand_fracs = [], [], []
    for t in range(moves):
        key, k = jax.random.split(key)
        if algorithm == "gumbel":
            res = gumbel_lib.run_gumbel_search(
                net, variables, states, k, num_simulations=sims,
                warm_root=warm, **search_kw)
            actions = res.chosen_action
        else:
            res = search_lib.run_search(
                net, variables, states, k, num_simulations=sims,
                c_puct=1.0, dirichlet_alpha=0.03, dirichlet_epsilon=0.25,
                warm_root=warm, **search_kw)
            actions = jnp.argmax(res.visit_counts, -1).astype(jnp.int32)
        wv, ws = tree_lib.root_child_warm_stats(res.tree, actions)
        live = ~states.done
        lc = live[:, None]
        warm = (jnp.where(lc, wv, 0.0), jnp.where(lc, ws, 0.0))
        live_np = np.asarray(live)
        frac = np.asarray(wv.sum(-1))[live_np] / sims
        if frac.size:
            all_fracs.append(frac)
            fracs.append(float(frac.mean()))
        # structure BELOW level 1 of the carried subtree: visits sitting on
        # the played child's grandchild edges. This is exactly what a full
        # re-rooting would preserve and the warm-root carry discards —
        # the marginal value ceiling of "subtree" over "root" reuse.
        children = np.asarray(tree_lib.children_index(res.tree))
        visits = np.asarray(tree_lib.visit_counts(res.tree))
        acts = np.asarray(actions)
        for b in np.nonzero(live_np)[0]:
            c1 = children[b, 0, acts[b]]
            gv = 0
            if c1 > 0:
                c2s = children[b, c1]
                gv = int(visits[b, c2s[c2s > 0]].sum())
            grand_fracs.append(gv / sims)
        states, _ = env.step(states, actions)
        if bool(np.asarray(states.done).all()):
            break
    cat = np.concatenate(all_fracs)
    grand = np.asarray(grand_fracs)
    return {"mean_warm_fraction": round(float(cat.mean()), 4),
            "p90_warm_fraction": round(float(np.percentile(cat, 90)), 4),
            "mean_grandchild_fraction": round(float(grand.mean()), 4),
            "per_move_mean_first8": [round(f, 3) for f in fracs[:8]],
            "moves_measured": len(fracs), "batch": batch, "sims": sims}


def main():
    cfg = Config.load(os.path.join(RUN, "config.json"))
    template = make_checkpoint_template(cfg)
    net = resnet.build_network(cfg.model)
    tree = ckpt_lib.restore_checkpoint(
        os.path.join(RUN, "checkpoints", f"it_{IT:06d}"), template)
    state = tree["state"]
    v = {"params": state.params, "batch_stats": state.batch_stats}

    results = {"protocol": {
        "run": RUN, "iteration": IT, "games_per_cell": GAMES,
        "temperature": 0.1,
        "arms": "A = tree_reuse root (grandchild carry), B = cold search, "
                "same net; colors split half/half (arena.play_pair "
                "tree_reuse/tree_reuse_b)"}}
    base = jax.random.PRNGKey(time.time_ns() % (2 ** 31))

    gk = dict(max_considered_actions=cfg.mcts.max_considered_actions,
              c_visit=cfg.mcts.c_visit, c_scale=cfg.mcts.c_scale)
    cells = [
        ("gumbel32_reuse_vs_cold",
         dict(num_simulations=32, algorithm="gumbel", **gk)),
        ("puct100_reuse_vs_cold",
         dict(num_simulations=100, algorithm="puct")),
        ("gumbel24_reuse_vs_gumbel32_cold",
         dict(num_simulations=24, num_simulations_b=32, algorithm="gumbel",
              **gk)),
        # the PUCT fix: same carry at 1/4 weight (Q preserved, allocation
        # distortion + stale-evidence inertia shrunk — tree.discount_warm)
        ("puct100_reuse_d25_vs_cold",
         dict(num_simulations=100, algorithm="puct",
              tree_reuse_discount=0.25)),
        ("gumbel32_reuse_d25_vs_cold",
         dict(num_simulations=32, algorithm="gumbel",
              tree_reuse_discount=0.25, **gk)),
    ]
    only = os.environ.get("AZR_CELLS")
    if only:
        want = set(only.split(","))
        cells = [c for c in cells if c[0] in want]
        prev = os.path.join(HERE, "reuse_strength.json")
        if os.path.exists(prev):  # merge into the existing artifact
            results = {**json.load(open(prev)), **results}
    skip_ceiling = bool(only) or os.environ.get("AZR_SKIP_CEILING")
    for i, (name, kw) in enumerate(cells):
        t0 = time.time()
        scores = play_pair(
            net, v, v, jax.random.fold_in(base, i), num_games=GAMES,
            c_puct=1.0, temperature=0.1, max_moves=60,
            tree_reuse="root", tree_reuse_b="off", **kw)
        rec = record(np.asarray(scores))
        rec["seconds"] = round(time.time() - t0, 1)
        results[name] = rec
        print(name, json.dumps(rec), flush=True)

    if not skip_ceiling:
        results["ceiling_gumbel32"] = warm_fraction(
            net, v, algorithm="gumbel", sims=32, **gk)
        print("ceiling_gumbel32", json.dumps(results["ceiling_gumbel32"]),
              flush=True)
        results["ceiling_puct100"] = warm_fraction(
            net, v, algorithm="puct", sims=100)
        print("ceiling_puct100", json.dumps(results["ceiling_puct100"]),
              flush=True)

    out = os.path.join(HERE, "reuse_strength.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
