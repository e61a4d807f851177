#!/usr/bin/env python
"""Search-vs-search: our batched array-tree MCTS against the reference's
pointer-tree MCTS with THE SAME model weights (the reference's trained
30-iteration checkpoint, imported via interop) — isolates the search
implementations from model quality. The two searches disagree on
individual moves (the reference mixes absolute and player-to-move value
perspectives, SURVEY.md §2.1 / mcts.py:569-575; ours is uniformly
player-to-move), so the question is which disagreement plays better.
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("AZR_SVS_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo/refbench")

import crossplay  # noqa: E402

from alphazero_reversi_tpu import interop  # noqa: E402

REF_BEST = "/root/repo/refbench/workdir_train30/checkpoints/best_model.pth"
OUT = "/root/repo/refbench/search_vs_search.json"


def main():
    games = int(os.environ.get("GAMES", 20))
    sims = int(os.environ.get("SIMS", 100))
    with tempfile.TemporaryDirectory() as tmp:
        ckpt_dir = os.path.join(tmp, "imported")
        interop.import_to_orbax(REF_BEST, ckpt_dir)
        ours = crossplay.OursAgent(ckpt_dir, sims, 0.1)
        ref = crossplay.RefAgent(REF_BEST, sims, 0.1)
        print(f"=== our search vs reference search, same weights "
              f"({games} games, {sims} sims) ===", flush=True)
        rec = crossplay.run_match(ours, ref, games, 5000)
    out = {"protocol": {
        "games": games, "sims": sims, "temperature": 0.1,
        "weights": f"{REF_BEST} (identical for both sides; ours via "
                   f"interop.import_to_orbax)",
        "scoring": "score of OUR search from its perspective",
    }, "our_search_vs_reference_search": rec}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
