#!/usr/bin/env python
"""Measure the merged-pairings eval gate on the real chip (PERF.md r5
"merge the gate's three pairings into ONE batched program" — the named
next lever of the phase-floor close-out).

Cells: the flagship promotion gate (players current/best/random, 5x128
bf16 net, Gumbel-32, rounds=5 x games_per_pair=2, tree_reuse=root) run as

* ``separate``  — batch_rounds: one program per pairing (3 dispatches), the
  r4 operating point that measured 1.76 s (1.52-1.91) in phase_floor.json;
* ``merged``    — merge_pairings: the whole gate as ONE program
  (arena._play_units_parts), sharing each half-ply's searches across
  pairings (2 searches at 2x batch instead of 4).

Timing rules (PERF.md): every repeat ends in a host fetch (the arena's
score arrays are np.ndarray, and the leaderboard is host math), fresh keys
per repeat (results are memoized), warmup dispatch excluded. Each mode
runs in its OWN subprocess ("one cell per subprocess" platform rule) so a
TPU backend error cannot poison the other cell.

Usage:
  python refbench/merged_eval.py            # driver: both cells -> JSON
  python refbench/merged_eval.py <mode>     # one cell, prints one JSON line
"""
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

REPEATS = 5
OUT = "/root/repo/refbench/merged_eval.json"


def run_cell(mode: str) -> None:
    import jax
    import numpy as np

    from alphazero_reversi_tpu import arena as arena_lib
    from alphazero_reversi_tpu.config import Config
    from alphazero_reversi_tpu.models import resnet

    cfg = Config.load("/root/repo/configs/flagship_run.json")
    tcfg = cfg.tournament
    tcfg.batch_rounds = mode == "separate"
    tcfg.merge_pairings = mode == "merged"

    net = resnet.build_network(cfg.model)
    v_cur = resnet.init_variables(net, jax.random.PRNGKey(0))
    v_best = resnet.init_variables(net, jax.random.PRNGKey(1))

    def gate(key):
        ar = arena_lib.Arena(net, tcfg, compat=cfg.env_compat)
        ar.add_player("current", v_cur)
        ar.add_player("best", v_best)
        ar.add_player("random", None)
        board = ar.run_tournament(key)
        # host-side ELO math consumed the fetched scores; touch the
        # ratings so nothing is left lazily unrealized
        return float(sum(p["rating"] for p in board))

    gate(jax.random.PRNGKey(100))  # warmup/compile
    times = []
    for r in range(REPEATS):
        t0 = time.perf_counter()
        s = gate(jax.random.PRNGKey(200 + r))  # fresh keys: no memoization
        times.append(time.perf_counter() - t0)
        assert np.isfinite(s)
    times.sort()
    print(json.dumps({"mode": mode, "times_s": [round(t, 3) for t in times],
                      "median_s": round(times[len(times) // 2], 3)}),
          flush=True)


def main() -> None:
    results = {}
    for mode in ("separate", "merged"):
        p = subprocess.run([sys.executable, __file__, mode],
                           capture_output=True, text=True, timeout=1800)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        if p.returncode != 0 or not line.startswith("{"):
            results[mode] = {"error": (p.stderr or p.stdout)[-2000:]}
            print(f"{mode}: FAILED", file=sys.stderr)
            continue
        results[mode] = json.loads(line)
        print(line)
    if all("median_s" in results.get(m, {}) for m in ("separate", "merged")):
        results["speedup"] = round(
            results["separate"]["median_s"] / results["merged"]["median_s"],
            3)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {OUT}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_cell(sys.argv[1])
    else:
        main()
