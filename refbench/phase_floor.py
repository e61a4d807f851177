#!/usr/bin/env python
"""Phase-floor extraction from a flagship training log (VERDICT r4 item 7).

Parses per-iteration phase seconds (selfplay / train / eval, plus the
relabel breakdown inside selfplay) and the wall-clock gap between
consecutive iteration log lines from `training.log`, and prints the
distribution each phase actually achieved on hardware — the measured side
of the PERF.md phase-floor close-out. Floors for comparison:

* selfplay: positions / sustained-search-rate (bench.py
  gumbel_flagship_moves_per_s cell) + measured relabel seconds;
* train: the dispatch-pipelined SGD probe (refbench/sgd_chunk_probe.py,
  0.33 s at any steps_per_dispatch);
* eval: dispatch + small-batch search fixed costs (see PERF.md analysis);
* checkpoint: fully overlapped (background fetch) — shows up only as the
  iteration-wall minus phase-sum residual.

Usage: python refbench/phase_floor.py <training.log> [sustained_moves_s]
"""
import json
import re
import sys
from datetime import datetime

import numpy as np

LOG = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/repo/runs_flagship/run_r5/logs/r5_flagship/training.log"
SUSTAINED = float(sys.argv[2]) if len(sys.argv) > 2 else 17250.0


def main():
    rows = []
    stamp_re = re.compile(r"^(\d{4}-\d{2}-\d{2} [\d:,]+) - .* - step (\d+): "
                          r"(.*)$")
    for line in open(LOG):
        m = stamp_re.match(line.strip())
        if not m:
            continue
        ts = datetime.strptime(m.group(1), "%Y-%m-%d %H:%M:%S,%f")
        kv = {}
        for pair in m.group(3).split(", "):
            if "=" in pair:
                k, v = pair.split("=", 1)
                try:
                    kv[k] = float(v)
                except ValueError:
                    pass
        rows.append((ts, int(m.group(2)), kv))

    def stats(vals):
        a = np.asarray(vals)
        return {"median": round(float(np.median(a)), 2),
                "p10": round(float(np.percentile(a, 10)), 2),
                "p90": round(float(np.percentile(a, 90)), 2),
                "min": round(float(a.min()), 2)}

    # skip the compile-dominated first iterations
    warm = [r for r in rows if r[1] >= 3]
    out = {"log": LOG, "iterations": len(rows), "warm_iterations": len(warm)}
    for key, label in (("selfplay/seconds", "selfplay"),
                       ("train/seconds", "train"),
                       ("eval/seconds", "eval"),
                       ("selfplay/relabel_seconds", "relabel")):
        vals = [r[2][key] for r in warm if key in r[2]]
        if vals:
            out[label] = stats(vals)
    walls = [(b[0] - a[0]).total_seconds()
             for a, b in zip(warm, warm[1:])]
    out["iteration_wall"] = stats(walls)

    positions = [r[2].get("selfplay/positions", 0) for r in warm]
    mean_pos = float(np.mean(positions))
    search_floor = mean_pos / SUSTAINED
    out["floors"] = {
        "selfplay_search_floor_s": round(search_floor, 2),
        "selfplay_floor_note": f"{mean_pos:.0f} moves / {SUSTAINED:.0f} "
                               "sustained moves/s (bench cell) + relabel",
        "train_floor_s": 0.33,
        "train_floor_note": "dispatch-pipelined scanned-SGD probe "
                            "(refbench/sgd_chunk_probe.py, r4)",
    }
    sp_med = out.get("selfplay", {}).get("median", 0.0)
    rel_med = out.get("relabel", {}).get("median", 0.0)
    if sp_med:
        out["floors"]["selfplay_fraction_of_floor"] = round(
            (search_floor + rel_med) / sp_med, 3)
    print(json.dumps(out, indent=2))
    with open("/root/repo/refbench/phase_floor.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
