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
from .mcts import gumbel as gumbel_lib
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


def _memory_columns() -> Dict[str, float]:
    """Memory usage columns for a benchmark row — the TPU analog of the
    reference harness's RSS + tracemalloc columns
    (/root/reference/src/mcts/MCTS_benchmark.py:136-168): device HBM
    in-use/peak bytes (``Device.memory_stats``, available on TPU; absent on
    the CPU backend) plus host RSS."""
    out: Dict[str, float] = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        if "bytes_in_use" in stats:
            out["hbm_bytes_in_use"] = int(stats["bytes_in_use"])
        if "peak_bytes_in_use" in stats:
            out["hbm_peak_bytes"] = int(stats["peak_bytes_in_use"])
    except Exception:
        pass  # backend without memory_stats
    try:
        import psutil

        out["host_rss_bytes"] = int(psutil.Process().memory_info().rss)
    except Exception:
        pass
    return out


# ---------------------------------------------------------------------------
# MCTS search
# ---------------------------------------------------------------------------

def bench_mcts(batch_sizes: Optional[List[int]] = None,
               num_simulations: int = 400, num_res_blocks: int = 5,
               num_filters: int = 128, repeats: int = 3,
               compute_dtype: str = "bfloat16", leaf_batch: int = 1,
               num_stages: int = 6) -> List[Dict[str, float]]:
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
                dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                num_stages=num_stages, leaf_batch=leaf_batch)

        best = _timeit(run, roots, repeats=repeats)
        results.append({
            "batch": b,
            "num_simulations": num_simulations,
            "leaf_batch": leaf_batch,
            "time_per_search_s": best,
            "moves_per_s": b / best,
            "nodes_per_s": b * num_simulations / best,
            **_memory_columns(),
        })
    return results


def bench_mcts_sustained(batch: int = 1024, num_simulations: int = 400,
                         moves: int = 8, num_res_blocks: int = 5,
                         num_filters: int = 128, repeats: int = 3,
                         compute_dtype: str = "bfloat16",
                         leaf_batch: int = 1, num_stages: int = 6,
                         max_depth: int = 24,
                         algorithm: str = "puct") -> Dict[str, float]:
    """Sustained MCTS-guided moves/s: ``moves`` consecutive search+step
    decisions inside ONE compiled program (the self-play inner loop,
    selfplay.play_games:151, with finished boards reset in place so every
    slot is live work), fetched once at the end.

    ``bench_mcts`` times a single ``run_search`` dispatch, which through
    the axon relay carries ~40-60 ms of fixed per-call latency (PERF.md
    pitfall 3) — negligible at the flagship point (~1.2 s/search) but
    dominant at fast operating points (tiny net / 32 sims ≈ 20-70 ms
    on-chip). Deployment amortizes that latency exactly like this loop
    does (self-play scans all move slots in one program), so this is the
    honest per-chip number for the >=50k moves/s/chip north star.
    """
    cfg = ModelConfig(num_res_blocks=num_res_blocks, num_filters=num_filters,
                      compute_dtype=compute_dtype)
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    fresh = env.initial_state((batch,))

    @jax.jit
    def run(key):
        def body(states, k):
            sk, ak = jax.random.split(k)
            if algorithm == "gumbel":
                gres = gumbel_lib.run_gumbel_search(
                    net, variables, states, sk,
                    num_simulations=num_simulations,
                    num_stages=num_stages, leaf_batch=leaf_batch,
                    max_depth=max_depth)
                actions = gres.chosen_action
            else:
                result = search_lib.run_search(
                    net, variables, states, sk,
                    num_simulations=num_simulations, c_puct=1.0,
                    dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                    num_stages=num_stages, leaf_batch=leaf_batch,
                    max_depth=max_depth)
                probs = search_lib.probs_with_temperature(
                    result.visit_counts, jnp.float32(1.0))
                actions = search_lib.sample_actions(ak, probs)
            ns, _ = env.step(states, actions)
            ns = jax.tree_util.tree_map(
                lambda f, n: jnp.where(ns.done, f, n), fresh, ns)
            return ns, None

        keys = jax.random.split(key, moves)
        final, _ = jax.lax.scan(body, fresh, keys)
        return final.black

    best = _timeit(lambda k: run(k), repeats=repeats)
    return {
        "batch": batch,
        "num_simulations": num_simulations,
        "leaf_batch": leaf_batch,
        "algorithm": algorithm,
        "moves_in_program": moves,
        "time_per_move_s": best / moves,
        "moves_per_s": batch * moves / best,
        "nodes_per_s": batch * moves * num_simulations / best,
        **_memory_columns(),
    }


def bench_nn_forward(batch: int, num_res_blocks: int, num_filters: int,
                     compute_dtype: str = "bfloat16", steps: int = 64,
                     repeats: int = 3) -> float:
    """Seconds per NN forward at ``batch``, measured inside a scanned loop
    (single dispatches through the relay measure the tunnel — PERF.md).
    This is the search's roofline: a perfectly tree-overhead-free search
    costs ``rounds x nn_forward(B x leaf_batch)``."""
    cfg = ModelConfig(num_res_blocks=num_res_blocks,
                      num_filters=num_filters, compute_dtype=compute_dtype)
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))

    @jax.jit
    def run(key):
        planes0 = jax.random.bernoulli(
            key, 0.3, (batch, 8, 8, 3)).astype(jnp.float32)

        def body(planes, _):
            logits, value = resnet.apply_eval(net, variables, planes)
            # feed outputs back in so iterations are data-dependent
            shift = (value.mean() + logits.mean()) * 1e-6
            return planes + shift, None

        final, _ = jax.lax.scan(body, planes0, None, length=steps)
        return final

    best = _timeit(lambda k: run(k), repeats=repeats)
    return best / steps


def bench_roofline(batch: int = 1024,
                   sims_list: Optional[List[int]] = None,
                   leaf_batches: Optional[List[int]] = None,
                   nets: Optional[List[Dict]] = None,
                   repeats: int = 3) -> List[Dict[str, float]]:
    """The operating-point table VERDICT round 1 asked for: moves/s across
    sims x net x leaf_batch, with the measured NN roofline
    (``batch / (rounds x nn_forward_time)``) and the fraction of it the
    search achieves. Answers "what operating point, if any, reaches the
    50k moves/s/chip north star"."""
    sims_list = sims_list or [32, 100, 400]
    leaf_batches = leaf_batches or [1, 4, 8]
    nets = nets or [
        {"name": "tiny-1x16", "blocks": 1, "filters": 16},
        {"name": "flagship-5x128", "blocks": 5, "filters": 128},
    ]
    rows = []
    for netspec in nets:
        nn_time = {}  # total NN batch -> s/forward
        for sims in sims_list:
            for lb in leaf_batches:
                if sims % lb:
                    continue
                nb = batch * lb
                if nb not in nn_time:
                    nn_time[nb] = bench_nn_forward(
                        nb, netspec["blocks"], netspec["filters"],
                        repeats=repeats)
                r = bench_mcts(
                    [batch], num_simulations=sims,
                    num_res_blocks=netspec["blocks"],
                    num_filters=netspec["filters"], repeats=repeats,
                    leaf_batch=lb)[0]
                rounds = sims // lb
                roofline = batch / (rounds * nn_time[nb])
                rows.append({
                    "net": netspec["name"], "batch": batch, "sims": sims,
                    "leaf_batch": lb,
                    "moves_per_s": round(r["moves_per_s"], 1),
                    "nn_ms_per_round": round(nn_time[nb] * 1e3, 3),
                    "roofline_moves_per_s": round(roofline, 1),
                    "roofline_frac": round(r["moves_per_s"] / roofline, 3),
                })
                print(json.dumps(rows[-1]), file=sys.stderr)
    return rows


# ---------------------------------------------------------------------------
# multi-device scaling
# ---------------------------------------------------------------------------

def bench_scaling(device_counts: Optional[List[int]] = None,
                  env_batch_per_device: int = 4096, env_steps: int = 256,
                  sp_games_per_device: int = 32, sp_sims: int = 16,
                  repeats: int = 3, skip_selfplay: bool = False) -> Dict:
    """Scaling-efficiency harness (BASELINE.md >=85% target; VERDICT item 5).

    For each device count d: env-steps/s and self-play moves/s with the
    batch sharded over a d-device ``data``-axis mesh, at constant
    per-device work (weak scaling). Efficiency = rate_d / (d x rate_1).
    On a real pod this measures ICI scaling; on the virtual CPU mesh it
    validates the sharded program and gives a proxy number (all "devices"
    share one physical core, so absolute rates drop — the harness reports
    the sharding overhead, not the pod's).
    """
    from .config import MeshConfig, ModelConfig as MC
    from .parallel import dp, mesh as mesh_lib

    device_counts = device_counts or [1, 2, 4, 8]
    n_avail = len(jax.devices())
    device_counts = [d for d in device_counts if d <= n_avail]

    out: Dict = {"devices_available": n_avail, "env": [], "selfplay": []}
    for d in device_counts:
        mesh = mesh_lib.make_mesh(MeshConfig(data_axis=d, model_axis=1))
        batch = env_batch_per_device * d
        fresh = mesh_lib.shard_batch(mesh, env.initial_state((batch,)))

        @jax.jit
        def run(states, key):
            def body(s, k):
                legal = env.legal_action_mask(s)
                scores = jax.random.uniform(k, (batch, env.NUM_ACTIONS))
                action = jnp.argmax(jnp.where(legal, scores, -1.0),
                                    axis=-1).astype(jnp.int32)
                ns, _ = env.step(s, action)
                ns = jax.tree_util.tree_map(
                    lambda f, n: jnp.where(ns.done, f, n), fresh, ns)
                return ns, None

            final, _ = jax.lax.scan(body, states,
                                    jax.random.split(key, env_steps))
            return final

        best = _timeit(run, fresh, repeats=repeats)
        out["env"].append({"devices": d, "batch": batch,
                           "env_steps_per_s": batch * env_steps / best})

        if not skip_selfplay:
            cfg = MC(num_res_blocks=1, num_filters=16,
                     value_head_hidden_size=16)
            net = resnet.build_network(cfg)
            variables = resnet.init_variables(net, jax.random.PRNGKey(0))
            games = sp_games_per_device * d

            def run_sp(k):
                from . import selfplay as selfplay_lib
                traj = dp.sharded_play_games(
                    net, variables, k, mesh, num_games=games,
                    num_simulations=sp_sims, c_puct=1.0,
                    dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                    temp_threshold=15, temp_init=1.0, temp_final=0.1,
                    max_moves=60)
                return traj.valid

            best = _timeit(lambda k: run_sp(k), repeats=repeats)
            out["selfplay"].append({
                "devices": d, "games": games,
                "moves_per_s": games * 60 / best})

    for key in ("env", "selfplay"):
        rows = out[key]
        if not rows:
            continue
        base = rows[0]
        rate_key = "env_steps_per_s" if key == "env" else "moves_per_s"
        for row in rows:
            ideal = base[rate_key] / base["devices"] * row["devices"]
            row["efficiency_pct"] = round(100.0 * row[rate_key] / ideal, 1)
    if jax.devices()[0].platform == "cpu":
        import os as _os

        cores = _os.cpu_count() or 1
        out["physical_cores"] = cores
        out["note"] = (
            f"virtual CPU mesh on {cores} physical cores: weak-scaling "
            f"efficiency is bounded by core oversubscription (the 1-device "
            f"baseline already uses every core via XLA:CPU intra-op "
            f"threading), NOT by sharding overhead — this run validates "
            f"the sharded programs only. For scaling EVIDENCE use the "
            f"fixed-resource protocols in refbench/scaling_fixed_work.py "
            f"(--mp: N gloo processes x 1 pinned core each reads 99% "
            f"self-play efficiency at N=4) plus the HLO zero-collectives "
            f"test; true ICI efficiency needs pod hardware")
    return out


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


def _random_endgame_board(empties: int, mode: int, seed: int):
    """Play random legal moves until ``empties`` squares remain; returns
    the OracleBoard (may be game_over if the line ended early). Shared by
    the solver benchmarks so both sample the same position distribution."""
    import random

    from .env import oracle as oracle_lib

    rng = random.Random(seed)
    b = oracle_lib.OracleBoard(mode)
    while (not b.game_over
           and 64 - bin(b.black | b.white).count("1") > empties):
        legal = b.legal_moves_bb()
        if legal == 0:
            b.step(oracle_lib.PASS_ACTION)
            continue
        b.step(rng.choice([s for s in range(64) if legal >> s & 1]))
    return b


def bench_solver(empties_list: Optional[List[int]] = None,
                 positions: int = 3, compat: bool = False,
                 wdl: bool = False) -> List[dict]:
    """Exact endgame solver throughput (native/solver.cpp — host CPU, not
    a device benchmark): per empties-depth, average solve time, nodes, and
    nodes/s over ``positions`` random late-game positions. ``wdl`` probes
    the (-1, 1) window (the match-play cost) instead of a full solve."""
    import time

    from .env import endgame as endgame_lib
    from .env import oracle as oracle_lib

    mode = oracle_lib.MODE_COMPAT if compat else oracle_lib.MODE_CORRECT
    solver = endgame_lib.EndgameSolver(compat=compat)
    rows = []
    for empties in (empties_list or [8, 12, 14, 16]):
        total_t = total_n = solved = 0
        for i in range(positions):
            b = _random_endgame_board(empties, mode, 9000 + 31 * empties + i)
            if b.game_over:
                continue
            solver.clear()  # cold solve: don't credit earlier repeats
            t0 = time.perf_counter()
            res = (solver.solve_wdl(b.black, b.white, b.current_player,
                                    passed=b.passed) if wdl
                   else solver.solve(b.black, b.white, b.current_player,
                                     passed=b.passed))
            total_t += time.perf_counter() - t0
            total_n += res.nodes
            solved += 1
        if solved == 0:
            continue
        rows.append({
            "empties": empties,
            "mode": "compat" if compat else "correct",
            "window": "wdl" if wdl else "full",
            "positions": solved,
            "avg_ms": round(1e3 * total_t / solved, 2),
            "avg_nodes": int(total_n / solved),
            "nodes_per_s": int(total_n / max(total_t, 1e-9)),
        })
    return rows


def bench_solver_batch(n_positions: int = 2048, empties: int = 12,
                       threads_list: Optional[List[int]] = None,
                       compat: bool = False) -> List[dict]:
    """Parallel batch-solver throughput (``EndgameSolver.solve_wdl_batch``,
    the exact-value relabel path's operating mode): WDL-probe
    ``n_positions`` random positions at ``empties`` per thread count, cold
    table each run. Reports positions/s and speedup vs 1 thread — the
    flagship relabel solves ~12k uniques/iteration at <=12 empties."""
    import os as _os
    import time

    import numpy as np

    from .env import endgame as endgame_lib
    from .env import oracle as oracle_lib

    mode = oracle_lib.MODE_COMPAT if compat else oracle_lib.MODE_CORRECT
    blacks, whites, movers = [], [], []
    i = 0
    while len(blacks) < n_positions:
        b = _random_endgame_board(empties, mode, 40000 + i)
        i += 1
        if b.game_over or b.legal_moves_bb() == 0:
            continue
        blacks.append(b.black)
        whites.append(b.white)
        movers.append(b.current_player)
    black = np.array(blacks, np.uint64)
    white = np.array(whites, np.uint64)
    mover = np.array(movers, np.int32)

    solver = endgame_lib.EndgameSolver(compat=compat)
    rows = []
    for nt in (threads_list or [1, 2, 4, _os.cpu_count() or 4]):
        solver.clear()  # cold table per run: no cross-run credit
        t0 = time.perf_counter()
        _values, solved, nodes = solver.solve_wdl_batch(
            black, white, mover, num_threads=nt)
        dt = time.perf_counter() - t0
        assert solved.all()
        rows.append({
            "empties": empties,
            "mode": "compat" if compat else "correct",
            "positions": int(n_positions),
            "threads": int(nt),
            "seconds": round(dt, 3),
            "positions_per_s": int(n_positions / dt),
            "nodes_per_s": int(nodes / dt),
        })
    # speedup vs the actual 1-thread run (not the first listed thread count)
    base = next((r["seconds"] for r in rows if r["threads"] == 1), None)
    if base is not None:
        for r in rows:
            r["speedup_vs_1thread"] = round(base / r["seconds"], 2)
    return rows


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
    m.add_argument("--leaf-batch", type=int, default=1)
    m.add_argument("--stages", type=int, default=6)

    ms = sub.add_parser("mcts-sustained")
    ms.add_argument("--batch", type=int, default=1024)
    ms.add_argument("--sims", type=int, default=400)
    ms.add_argument("--moves", type=int, default=8)
    ms.add_argument("--blocks", type=int, default=5)
    ms.add_argument("--filters", type=int, default=128)
    ms.add_argument("--dtype", default="bfloat16")
    ms.add_argument("--leaf-batch", type=int, default=1)
    ms.add_argument("--stages", type=int, default=6)
    ms.add_argument("--algorithm", choices=("puct", "gumbel"),
                    default="puct")

    r = sub.add_parser("roofline")
    r.add_argument("--batch", type=int, default=1024)
    r.add_argument("--sims", type=int, nargs="+", default=None)
    r.add_argument("--leaf-batches", type=int, nargs="+", default=None)

    s = sub.add_parser("scaling")
    s.add_argument("--devices", type=int, nargs="+", default=None)
    s.add_argument("--env-batch-per-device", type=int, default=4096)
    s.add_argument("--games-per-device", type=int, default=32)
    s.add_argument("--sims", type=int, default=16)
    s.add_argument("--skip-selfplay", action="store_true")

    f = sub.add_parser("profile")
    f.add_argument("--trace-dir", default="/tmp/jax_trace")
    f.add_argument("--batch", type=int, default=1024)
    f.add_argument("--sims", type=int, default=400)

    so = sub.add_parser("solver")
    so.add_argument("--empties", type=int, nargs="+", default=None)
    so.add_argument("--positions", type=int, default=3)
    so.add_argument("--compat", action="store_true")
    so.add_argument("--wdl", action="store_true",
                    help="probe win/draw/loss only (match-play cost)")

    sb = sub.add_parser("solver-batch",
                        help="parallel batch WDL solves (relabel path)")
    sb.add_argument("--positions", type=int, default=2048)
    sb.add_argument("--empties", type=int, default=12)
    sb.add_argument("--threads", type=int, nargs="+", default=None)
    sb.add_argument("--compat", action="store_true")

    args = p.parse_args(argv)
    if args.command == "env":
        print(json.dumps(bench_env(args.batch, args.steps,
                                   compat=args.compat), indent=2))
    elif args.command == "mcts":
        for row in bench_mcts(args.batch_sizes, args.sims, args.blocks,
                              args.filters, compute_dtype=args.dtype,
                              leaf_batch=args.leaf_batch,
                              num_stages=args.stages):
            print(json.dumps(row))
    elif args.command == "mcts-sustained":
        print(json.dumps(bench_mcts_sustained(
            args.batch, args.sims, args.moves, args.blocks, args.filters,
            compute_dtype=args.dtype, leaf_batch=args.leaf_batch,
            num_stages=args.stages, algorithm=args.algorithm), indent=2))
    elif args.command == "roofline":
        print(json.dumps(bench_roofline(args.batch, args.sims,
                                        args.leaf_batches), indent=2))
    elif args.command == "scaling":
        print(json.dumps(bench_scaling(
            args.devices, args.env_batch_per_device,
            sp_games_per_device=args.games_per_device, sp_sims=args.sims,
            skip_selfplay=args.skip_selfplay), indent=2))
    elif args.command == "profile":
        out = profile_search(args.trace_dir, args.batch, args.sims)
        print(f"trace written to {out}", file=sys.stderr)
    elif args.command == "solver":
        for row in bench_solver(args.empties, args.positions,
                                compat=args.compat, wdl=args.wdl):
            print(json.dumps(row))
    elif args.command == "solver-batch":
        for row in bench_solver_batch(args.positions, args.empties,
                                      args.threads, compat=args.compat):
            print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
