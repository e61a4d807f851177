#!/usr/bin/env python
"""Recover the 30-iteration anchor matches lost to the TPU-relay failure:
each 30-iter agent vs the random baseline, on CPU (JAX forced to the CPU
backend for our agent; the reference is CPU-only here anyway)."""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo/refbench")
import crossplay  # noqa: E402

GAMES = 12


def main():
    ours = crossplay.OursAgent(
        "/root/repo/refbench/workdir_repo_train30/checkpoints", 100, 0.1)
    ref = crossplay.RefAgent(
        "/root/repo/refbench/workdir_train30/checkpoints/best_model.pth",
        100, 0.1)
    rnd = crossplay.RandomAgent()

    print("=== ours vs random ===", flush=True)
    ours_rec = crossplay.run_match(ours, rnd, GAMES, 2000)
    print("=== reference vs random ===", flush=True)
    ref_rec = crossplay.run_match(ref, rnd, GAMES, 3000)

    path = "/root/repo/refbench/crossplay30_results.json"
    with open(path) as f:
        rec = json.load(f)
    rec["ours_vs_random"] = ours_rec
    rec["reference_vs_random"] = ref_rec
    rec["protocol"]["note"] = (
        "head-to-head ran on TPU and was aborted during game 30 by a "
        "TPU-relay infrastructure failure (tally from crossplay30.log); "
        "anchor matches re-run afterwards on CPU (crossplay30_anchors.py), "
        "same seeds as the 10-iteration anchors.")
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps({"ours_vs_random": ours_rec,
                      "reference_vs_random": ref_rec}))


if __name__ == "__main__":
    main()
