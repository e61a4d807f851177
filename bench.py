#!/usr/bin/env python
"""Headline benchmark: raw env stepping throughput on one chip.

Prints exactly ONE JSON line on stdout:
``{"metric": "env_steps_per_s", "value": N, "unit": "steps/s/chip",
"vs_baseline": N}`` where ``vs_baseline`` is the ratio to the driver-set
north-star target of 1M env-steps/s/chip (BASELINE.md — the reference itself
publishes no numbers; its own harness, a 100k-move greedy loop over the
Python board, measures the same quantity, /root/reference/
test_cython_performance_fixed.py:10-46).

Method: a jitted ``lax.scan`` stepping a large batch of boards with a
pseudo-random legal placement each step, resetting finished games in place so
every step is live work. Diagnostics go to stderr; stdout carries only the
JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from alphazero_reversi_tpu.env import bitboard as env

NORTH_STAR = 1_000_000.0  # env-steps/s/chip (BASELINE.md target)


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


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)
    value = bench_env_steps()
    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(value, 1),
        "unit": "steps/s/chip",
        "vs_baseline": round(value / NORTH_STAR, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
