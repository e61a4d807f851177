#!/usr/bin/env python
"""Headline benchmark: env stepping + flagship MCTS throughput on one chip.

Prints exactly ONE JSON line on stdout:
``{"metric": "env_steps_per_s", "value": N, "unit": "steps/s/chip",
"vs_baseline": N, "mcts_moves_per_s": N, "mcts_vs_baseline": N,
"mcts_peak_moves_per_s": N, ...}`` where ``vs_baseline`` is the ratio to
the driver-set north-star target of 1M env-steps/s/chip; ``mcts_*`` tracks
the flagship search operating point (B=1024 games, 400 sims/move, 5x128
bf16 net) and ``mcts_peak_*`` the fast operating point (tiny 1x16 net, 32
sims — DummyModel scale, like the reference's own benchmark) against the
50k moves/s/chip target, ``gumbel_*`` the Gumbel sequential-halving
search at that same point (mcts/gumbel.py), and ``gumbel_flagship_*`` the
Gumbel searcher on the flagship 5x128 net — the flagship *training*
operating point (configs/flagship_run.json) (BASELINE.md — the reference itself publishes no numbers; its own
harnesses measure the same quantities: /root/reference/
test_cython_performance_fixed.py:10-46 for env stepping and
/root/reference/src/mcts/MCTS_benchmark.py:101-191 for search throughput;
measured locally they give 10.5k env-moves/s and 2.0 MCTS moves/s,
refbench/reference_measurements.json).

Method: env — a jitted ``lax.scan`` stepping a large batch of boards with a
pseudo-random legal placement each step, resetting finished games in place so
every step is live work. MCTS — SUSTAINED throughput: several consecutive
search+step move decisions inside ONE compiled program (the self-play inner
loop; per-dispatch timing would add ~40-60 ms of relay latency per move,
PERF.md pitfall 3), moves/s = moves x 1024 / best wall time to a host
fetch. Diagnostics go to stderr; stdout carries only the JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from alphazero_reversi_tpu.env import bitboard as env

NORTH_STAR = 1_000_000.0  # env-steps/s/chip (BASELINE.md target)
MCTS_NORTH_STAR = 50_000.0  # MCTS-guided moves/s/chip (BASELINE.md target)


def build_bench(batch: int, steps: int):
    fresh = env.initial_state((batch,))

    @jax.jit
    def run(states, key):
        def body(s, k):
            legal = env.legal_action_mask(s)
            scores = jax.random.uniform(k, (batch, env.NUM_ACTIONS))
            action = jnp.argmax(jnp.where(legal, scores, -1.0),
                                axis=-1).astype(jnp.int32)
            ns, _ = env.step(s, action)
            # reset finished boards so every step does real work
            ns = jax.tree_util.tree_map(
                lambda f, n: jnp.where(ns.done, f, n), fresh, ns)
            return ns, None

        keys = jax.random.split(key, steps)
        final, _ = jax.lax.scan(body, states, keys)
        return final

    return fresh, run


def bench_env_steps(batch: int = 8192, steps: int = 512,
                    repeats: int = 5) -> float:
    states, run = build_bench(batch, steps)
    # fresh wall-clock-derived keys: the runtime caches results of identical
    # (program, inputs) executions across processes
    key = jax.random.PRNGKey(time.time_ns() % (2**31))
    # warmup + compile. NOTE: time to a HOST FETCH, not block_until_ready —
    # on the axon remote platform block_until_ready returns before the work
    # actually executes (measured: a physically-impossible 1.3 ms for a
    # 400-round MCTS; see PERF.md "measurement pitfalls").
    import numpy as np

    def fetch(out):
        return float(np.asarray(out.black.lo).sum())

    fetch(run(states, key))
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        fetch(run(states, jax.random.fold_in(key, i)))
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def bench_mcts_moves(batch: int = 1024, sims: int = 400,
                     leaf_batch: int = 16, moves: int = 4) -> float:
    """Flagship search throughput: sustained moves/s at B games, 400 sims,
    5x128 bf16 (the operating point PERF.md's roofline table tracks) —
    ``moves`` consecutive search+step decisions inside one program, the
    self-play inner loop (per-dispatch timing adds ~40-60 ms of relay
    latency per move batch; PERF.md pitfall 3). ``leaf_batch`` defaults to
    the measured-best multi-leaf setting."""
    import os

    from alphazero_reversi_tpu.benchmarks import bench_mcts_sustained

    leaf_batch = int(os.environ.get("AZR_BENCH_LEAF_BATCH", leaf_batch))
    row = bench_mcts_sustained(batch, sims, moves=moves,
                               leaf_batch=leaf_batch)
    return row["moves_per_s"]


def bench_mcts_peak(batch: int = 1024, sims: int = 32,
                    leaf_batch: int = 8, moves: int = 16) -> float:
    """The 50k-north-star cell: sustained MCTS-guided moves/s at the fast
    operating point (tiny 1x16 net, 32 sims — the scale of net/search the
    reference's own DummyModel benchmark uses,
    /root/reference/src/mcts/MCTS_benchmark.py:28-67)."""
    from alphazero_reversi_tpu.benchmarks import bench_mcts_sustained

    row = bench_mcts_sustained(batch, sims, moves=moves,
                               num_res_blocks=1, num_filters=16,
                               leaf_batch=leaf_batch)
    return row["moves_per_s"]


def bench_gumbel(batch: int = 1024, sims: int = 32,
                 leaf_batch: int = 8, moves: int = 16) -> float:
    """Gumbel sequential-halving search at the same fast operating point —
    the algorithm that keeps AlphaZero's policy improvement at 16-32 sims
    (mcts/gumbel.py), i.e. the strength-per-second cell."""
    from alphazero_reversi_tpu.benchmarks import bench_mcts_sustained

    row = bench_mcts_sustained(batch, sims, moves=moves,
                               num_res_blocks=1, num_filters=16,
                               leaf_batch=leaf_batch, algorithm="gumbel")
    return row["moves_per_s"]


def bench_gumbel_flagship(batch: int = 1024, sims: int = 32,
                          leaf_batch: int = 1, moves: int = 16) -> float:
    """The training-relevant strength-per-second cell: Gumbel sequential
    halving on the FLAGSHIP 5x128 bf16 net at 32 sims — the searcher/net the
    flagship training operating point actually runs
    (configs/flagship_run.json; measured best leaf_batch=1, num_stages=4:
    refbench/sustained_tpu.jsonl 2026-08-19 rows)."""
    from alphazero_reversi_tpu.benchmarks import bench_mcts_sustained

    row = bench_mcts_sustained(batch, sims, moves=moves,
                               num_res_blocks=5, num_filters=128,
                               leaf_batch=leaf_batch, num_stages=4,
                               algorithm="gumbel")
    return row["moves_per_s"]


def bench_flagship_iteration(iters: int = 3) -> float:
    """End-to-end flagship TRAINING iteration wall seconds (the number the
    round-4 pipeline work drove ~15 s -> ~7-9 s): run ``iters`` iterations
    of the real pipeline (configs/flagship_run.json operating point — 1024
    games Gumbel-32 self-play, exact-value relabel, 480-step scanned SGD,
    batched eval, background checkpoint save) from a fresh init in temp
    dirs, and report the FASTEST full iteration (first is
    compile-dominated). Includes every phase: self-play, relabel, SGD,
    eval, checkpoint schedule, logging."""
    import os
    import tempfile

    from alphazero_reversi_tpu.config import Config
    from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline

    cfg = Config.load(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "configs", "flagship_run.json"))
    best = float("inf")
    with tempfile.TemporaryDirectory() as tmp:
        cfg.training.checkpoint_dir = os.path.join(tmp, "ckpt")
        cfg.training.num_epochs = iters
        cfg.self_play.save_dir = os.path.join(tmp, "sp")
        cfg.self_play.save_every = 0
        cfg.logging.log_dir = os.path.join(tmp, "logs")
        cfg.logging.use_tensorboard = False
        cfg.logging.verbose = False
        pipe = AlphaZeroPipeline(cfg, run_name="bench_iter")
        for k in range(1, iters + 1):
            t0 = time.perf_counter()
            pipe.train(num_iterations=k)  # runs exactly one more iteration
            dt = time.perf_counter() - t0
            print(f"flagship iteration {k}: {dt:.2f} s"
                  + (" (compile)" if k == 1 else ""), file=sys.stderr)
            if k > 1:
                best = min(best, dt)
    return best


def _start_watchdog(budget_s: float, what: str):
    """Hard-exit if the device stops responding: the axon relay can die
    (observed 2026-08-17 — jax calls then block forever in C++ land where
    no Python timeout reaches). Exiting non-zero with a diagnostic beats
    hanging the driver; no JSON line is printed, so no fake metric gets
    recorded. Returns the timer so a finished stage can cancel it."""
    import os
    import threading

    def blow():
        print(f"bench watchdog: {what} not done within {budget_s:.0f}s — "
              f"device/relay unresponsive; aborting without a metric",
              file=sys.stderr, flush=True)
        os._exit(17)

    t = threading.Timer(budget_s, blow)
    t.daemon = True
    t.start()
    return t


def main() -> int:
    import os

    # Two stages: device acquisition is seconds when the relay is alive and
    # blocks forever when it is dead — fail that fast, then give the actual
    # benchmarks the full budget.
    probe = _start_watchdog(
        float(os.environ.get("AZR_BENCH_PROBE_TIMEOUT_S", 180)),
        "device acquisition")
    dev = jax.devices()[0]
    probe.cancel()
    _start_watchdog(float(os.environ.get("AZR_BENCH_TIMEOUT_S", 2400)),
                    "benchmarks")
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    value = bench_env_steps()
    print(f"env_steps_per_s: {value:.0f}", file=sys.stderr)
    mcts = bench_mcts_moves()
    print(f"mcts flagship sustained: {mcts:.0f} moves/s", file=sys.stderr)
    peak = bench_mcts_peak()
    print(f"mcts peak sustained (tiny net, 32 sims): {peak:.0f} moves/s",
          file=sys.stderr)
    gumbel = bench_gumbel()
    print(f"gumbel sustained (tiny net, 32 sims): {gumbel:.0f} moves/s",
          file=sys.stderr)
    gumbel_flag = bench_gumbel_flagship()
    print(f"gumbel flagship sustained (5x128 net, 32 sims): "
          f"{gumbel_flag:.0f} moves/s", file=sys.stderr)
    iter_s = bench_flagship_iteration()
    print(f"flagship end-to-end iteration: {iter_s:.2f} s", file=sys.stderr)
    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(value, 1),
        "unit": "steps/s/chip",
        "vs_baseline": round(value / NORTH_STAR, 4),
        "mcts_moves_per_s": round(mcts, 1),
        "mcts_vs_baseline": round(mcts / MCTS_NORTH_STAR, 4),
        "mcts_peak_moves_per_s": round(peak, 1),
        "mcts_peak_operating_point": "tiny-1x16 net, 32 sims, leaf_batch 8",
        "mcts_peak_vs_baseline": round(peak / MCTS_NORTH_STAR, 4),
        "gumbel_moves_per_s": round(gumbel, 1),
        "gumbel_vs_baseline": round(gumbel / MCTS_NORTH_STAR, 4),
        "gumbel_flagship_moves_per_s": round(gumbel_flag, 1),
        "gumbel_flagship_operating_point":
            "5x128 bf16 net, 32 sims, leaf_batch 1",
        "gumbel_flagship_vs_baseline": round(gumbel_flag / MCTS_NORTH_STAR,
                                             4),
        # end-to-end training iteration at the flagship operating point
        # (every phase incl. checkpoint; r3 ~15 s -> r4, PERF.md)
        "flagship_iteration_s": round(iter_s, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
