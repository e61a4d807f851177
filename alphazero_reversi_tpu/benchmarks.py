"""Benchmark & profiling harnesses.

Mirrors the reference's measurement surface with the same metrics so numbers
are comparable (SURVEY.md §4 implication 5):

* ``env``  — env stepping steps/s (the reference's 100k-move greedy loops,
  /root/reference/test_cython_performance_fixed.py:10-46,
  test_cython_direct.py:17-36 — there: one board on the host CPU; here: a
  jitted batch on the chip).
* ``mcts`` — MCTS-guided moves/s and nodes/s across batch sizes
  (/root/reference/src/mcts/MCTS_benchmark.py:101-191 measures time/search
  and nodes/s at batch sizes {1,8,16,32,64} with a dummy net; the TPU
  equivalent scales the *game* batch axis).
* ``profile`` — ``jax.profiler`` trace of one search (the cProfile analog,
  /root/reference/src/mcts/profile_mcts.py:82-101; inspect with
  TensorBoard/XProf or Perfetto).

CLI: ``python -m alphazero_reversi_tpu.benchmarks {env,mcts,profile} ...``
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .env import bitboard as env
from .mcts import search as search_lib
from .models import resnet


def _timeit(fn, *args, repeats: int = 5) -> float:
    """Best-of-N wall time of a blocking call (compile excluded).

    ``fn`` is called as ``fn(*args, key)`` with a fresh, never-before-used
    PRNG key per repeat: the TPU runtime here caches results of identical
    (program, inputs) executions ACROSS PROCESSES, so a key that any earlier
    run ever used measures the cache, not the chip. Keys derive from the
    wall clock."""
    import numpy as np

    def fetch(out):
        # force a real host fetch: on the axon remote platform
        # block_until_ready returns before execution (PERF.md pitfalls)
        leaves = jax.tree_util.tree_leaves(out)
        return float(np.asarray(leaves[0]).ravel()[0])

    base = jax.random.PRNGKey(time.time_ns() % (2**31))
    fetch(fn(*args, jax.random.fold_in(base, 0)))
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        fetch(fn(*args, jax.random.fold_in(base, 1 + i)))
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------------------
# env stepping
# ---------------------------------------------------------------------------

def bench_env(batch: int = 8192, steps: int = 512, repeats: int = 5,
              compat: bool = False) -> Dict[str, float]:
    """Random-legal-move stepping with in-place resets; steps/s."""
    fresh = env.initial_state((batch,))

    @jax.jit
    def run(states, key):
        def body(s, k):
            legal = env.legal_action_mask(s, compat=compat)
            scores = jax.random.uniform(k, (batch, env.NUM_ACTIONS))
            action = jnp.argmax(jnp.where(legal, scores, -1.0),
                                axis=-1).astype(jnp.int32)
            ns, _ = env.step(s, action, compat=compat)
            ns = jax.tree_util.tree_map(
                lambda f, n: jnp.where(ns.done, f, n), fresh, ns)
            return ns, None

        final, _ = jax.lax.scan(body, states, jax.random.split(key, steps))
        return final

    best = _timeit(run, fresh, repeats=repeats)
    return {
        "batch": batch,
        "steps": steps,
        "seconds": best,
        "env_steps_per_s": batch * steps / best,
    }


# ---------------------------------------------------------------------------
# MCTS search
# ---------------------------------------------------------------------------

def bench_mcts(batch_sizes: Optional[List[int]] = None,
               num_simulations: int = 400, num_res_blocks: int = 5,
               num_filters: int = 128, repeats: int = 3,
               compute_dtype: str = "bfloat16") -> List[Dict[str, float]]:
    """Time one full search (one *move decision* for every game in the
    batch) across batch sizes; report time/search, moves/s, nodes/s.

    ``nodes/s`` counts simulations x games, the reference's metric
    (MCTS_benchmark.py:160: nodes_per_second = num_simulations / elapsed,
    for its single game); ``moves/s`` is games / elapsed — the BASELINE.md
    north-star metric (>= 50k moves/s/chip).
    """
    batch_sizes = batch_sizes or [64, 256, 1024, 4096]
    cfg = ModelConfig(num_res_blocks=num_res_blocks, num_filters=num_filters,
                      compute_dtype=compute_dtype)
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))

    results = []
    for b in batch_sizes:
        roots = env.initial_state((b,))

        def run(states, k):
            return search_lib.run_search(
                net, variables, states, k,
                num_simulations=num_simulations, c_puct=1.0,
                dirichlet_alpha=0.3, dirichlet_epsilon=0.25)

        best = _timeit(run, roots, repeats=repeats)
        results.append({
            "batch": b,
            "num_simulations": num_simulations,
            "time_per_search_s": best,
            "moves_per_s": b / best,
            "nodes_per_s": b * num_simulations / best,
        })
    return results


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------

def profile_search(trace_dir: str = "/tmp/jax_trace", batch: int = 1024,
                   num_simulations: int = 400, num_res_blocks: int = 5,
                   num_filters: int = 128) -> str:
    """Capture a ``jax.profiler`` trace of one compiled search."""
    cfg = ModelConfig(num_res_blocks=num_res_blocks,
                      num_filters=num_filters)
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    roots = env.initial_state((batch,))

    def run(k):
        return search_lib.run_search(
            net, variables, roots, k, num_simulations=num_simulations,
            c_puct=1.0, dirichlet_alpha=0.3, dirichlet_epsilon=0.25)

    jax.block_until_ready(run(jax.random.PRNGKey(0)))  # compile first
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(run(jax.random.PRNGKey(1)))
    return trace_dir


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="alphazero-reversi-tpu-bench")
    sub = p.add_subparsers(dest="command", required=True)

    e = sub.add_parser("env")
    e.add_argument("--batch", type=int, default=8192)
    e.add_argument("--steps", type=int, default=512)
    e.add_argument("--compat", action="store_true")

    m = sub.add_parser("mcts")
    m.add_argument("--batch-sizes", type=int, nargs="+", default=None)
    m.add_argument("--sims", type=int, default=400)
    m.add_argument("--blocks", type=int, default=5)
    m.add_argument("--filters", type=int, default=128)
    m.add_argument("--dtype", default="bfloat16")

    f = sub.add_parser("profile")
    f.add_argument("--trace-dir", default="/tmp/jax_trace")
    f.add_argument("--batch", type=int, default=1024)
    f.add_argument("--sims", type=int, default=400)

    args = p.parse_args(argv)
    if args.command == "env":
        print(json.dumps(bench_env(args.batch, args.steps,
                                   compat=args.compat), indent=2))
    elif args.command == "mcts":
        for row in bench_mcts(args.batch_sizes, args.sims, args.blocks,
                              args.filters, compute_dtype=args.dtype):
            print(json.dumps(row))
    elif args.command == "profile":
        out = profile_search(args.trace_dir, args.batch, args.sims)
        print(f"trace written to {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
