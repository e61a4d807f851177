"""Gumbel AlphaZero search: sequential halving with Gumbel at the root.

A second search algorithm alongside the PUCT driver (``search.run_search``),
implementing "Policy improvement by planning with Gumbel" (Danihelka, Guez,
Munos & Silver, ICLR 2022 — the algorithm behind DeepMind's mctx
``gumbel_muzero_policy``; reimplemented here from the paper for this
framework's packed array tree). It has no counterpart in the reference
(/root/reference/src/mcts/mcts.py implements classic PUCT only): it exists
because it moves the *effective* moves/s-at-equal-strength operating point —
Gumbel search keeps AlphaZero's policy-improvement guarantee at very small
simulation budgets (16-32 sims vs the reference's 400 default), which is
exactly the regime where this framework's TPU search peaks (PERF.md: 94k-221k
moves/s/chip at 32 sims).

How it maps onto the array tree (same ``tree.Tree``, same slot allocation,
same fused backup as the PUCT driver — only the selection rules differ):

* **Root**: sample one Gumbel vector ``g[B, A]`` per search. Simulation ``i``
  must visit an action whose root visit count equals a precomputed
  *prescribed count* ``seq[i]`` (``halving_schedule``); among those, it picks
  ``argmax g + logits + sigma(q-hat)``. Because exactly the phase's surviving
  candidates sit at the prescribed count, this mask implements sequential
  halving with no explicit candidate bookkeeping.
* **Interior nodes** (deterministic, no noise): visit
  ``argmax pi'(a) - N(a) / (1 + sum_b N(b))`` where
  ``pi' = softmax(logits + sigma(completed Q))`` — the paper's
  "planning at non-root nodes" rule.
* **Q completion**: unvisited actions take the *mixed value* estimate
  ``(v_node + sum_N * weighted_visited_Q) / (1 + sum_N)`` (the node's own
  raw NN value is stored in its packed row, ``tree.S_VALUE``); completed
  Q-values are min-max rescaled over legal actions and scaled by
  ``(c_visit + max_a N(a)) * c_scale``.
* **Output**: the move is the halving *winner* (argmax of
  ``g + logits + sigma`` over actions at the final prescribed count) — not a
  temperature sample; exploration comes from the Gumbel draw. The policy
  training target is the *improved policy* ``softmax(logits + sigma)``
  (noise-free), which is what gives the few-simulation policy-improvement
  property.

Perf idioms shared with the PUCT driver (measured on this hardware —
PERF.md): one-hot column picks instead of ``take_along_axis``, static slot
allocation, lockstep multi-leaf descent below the root, depth-staged select
unrolling, staged tree-capacity growth, and the whole-round fused
backup+link scatter (``search.expand_and_backup``).
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..env import bitboard as env
from . import tree as tree_lib
from .search import (_evaluate, _grow_tree, _stage_bounds, expand_and_backup,
                     probs_with_temperature)

A = env.NUM_ACTIONS
# plain Python float, NOT jnp.float32: a module-level jnp value would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize in multi-process workers (test_multiprocess)
_NEG = -1e30


# --------------------------------------------------------------------------
# Sequential-halving schedule
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def halving_schedule(num_considered: int, num_simulations: int
                     ) -> Tuple[int, ...]:
    """Prescribed root visit count before each simulation.

    Sequential halving (Karnin et al. 2013) over ``num_considered``
    candidates with a budget of ``num_simulations``: ``ceil(log2 m)`` phases,
    each giving every surviving candidate ``max(1, n / (log2(m) * m_p))``
    extra visits, then halving the survivor set. Because survivors all sit
    at the same visit count entering a phase, the schedule reduces to a
    nondecreasing sequence ``seq`` with simulation ``i`` visiting some action
    whose current count is exactly ``seq[i]`` — the score argmax then makes
    the *best* ``m_p`` actions the ones that reach each count, which IS the
    halving.
    """
    if num_considered <= 1:
        return tuple(range(num_simulations))
    phases = max(1, math.ceil(math.log2(num_considered)))
    seq: list = []
    count = 0
    alive = num_considered
    while len(seq) < num_simulations:
        extra = max(1, num_simulations // (phases * alive))
        for _ in range(extra):
            seq.extend([count] * alive)
            count += 1
        alive = max(2, alive // 2)
    return tuple(seq[:num_simulations])


def schedule_table(max_considered: int, num_simulations: int) -> np.ndarray:
    """``[max_considered + 1, num_simulations]`` int32: row ``m`` is the
    schedule for ``m`` candidate actions (games with fewer legal moves than
    ``max_considered`` follow the row for their own legal count)."""
    rows = [halving_schedule(max(m, 1), num_simulations)
            for m in range(max_considered + 1)]
    return np.asarray(rows, np.int32)


# --------------------------------------------------------------------------
# Q completion / sigma transform
# --------------------------------------------------------------------------

def completed_q_sigma(visits: jax.Array, vsum: jax.Array, prior: jax.Array,
                      legal: jax.Array, raw_value: jax.Array,
                      c_visit: float, c_scale: float) -> jax.Array:
    """``sigma(completed q-hat)`` ([..., A]) for selection/targets.

    ``visits``/``vsum`` are the node's per-action edge stats (value sums
    already from the node's player-to-move POV — tree.py convention);
    ``raw_value`` is the node's own NN evaluation (``tree.S_VALUE``).
    Unvisited actions are completed with the mixed-value estimate; completed
    values are min-max rescaled over legal actions and scaled by
    ``(c_visit + max_a N(a)) * c_scale`` (paper eq. for sigma; mctx's
    ``qtransform_completed_by_mix_value``).
    """
    visited = visits > 0
    q = jnp.where(visited, vsum / jnp.maximum(visits, 1.0), 0.0)
    sum_n = visits.sum(-1, keepdims=True)
    prior_visited = jnp.where(visited, prior, 0.0)
    psum = prior_visited.sum(-1, keepdims=True)
    weighted_q = (prior_visited * q).sum(-1, keepdims=True) / \
        jnp.maximum(psum, 1e-12)
    v_mix = (raw_value[..., None] + sum_n * weighted_q) / (sum_n + 1.0)
    completed = jnp.where(visited, q, v_mix)
    # min-max rescale over LEGAL actions to [0, 1] (degenerate span -> 0)
    big = jnp.where(legal, completed, _NEG)
    small = jnp.where(legal, completed, -_NEG)
    cmax = big.max(-1, keepdims=True)
    cmin = small.min(-1, keepdims=True)
    rescaled = (completed - cmin) / jnp.maximum(cmax - cmin, 1e-8)
    max_n = visits.max(-1, keepdims=True)
    return (c_visit + max_n) * c_scale * jnp.where(legal, rescaled, 0.0)


def _logits(prior: jax.Array, legal: jax.Array) -> jax.Array:
    """Recover action logits from the stored masked-softmax prior (exact up
    to a per-game constant, which every consumer here is invariant to)."""
    return jnp.where(legal, jnp.log(jnp.maximum(prior, 1e-12)), _NEG)


def _masked_argmax(score: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.argmax(jnp.where(mask, score, _NEG), -1).astype(jnp.int32)


class GumbelResult(NamedTuple):
    """Outcome of one batched Gumbel search."""

    visit_counts: jax.Array  # [B, A] root child visit counts
    action_probs: jax.Array  # [B, A] improved policy (the training target)
    chosen_action: jax.Array  # [B] sequential-halving winner (the move)
    root_value: jax.Array  # [B] mean root value (root player POV)
    tree: tree_lib.Tree


def play_probs(result: GumbelResult, temperature) -> jax.Array:
    """Per-game action distribution for PLAY (not training) at a given
    temperature: at ~zero temperature the move is the sequential-halving
    winner (the paper's action selection); above it, actions sample from
    the tempered improved policy. Single definition shared by
    ``MCTS.get_action_probs`` and the arena's per-side policies."""
    temperature = jnp.float32(temperature)
    greedy = jax.nn.one_hot(result.chosen_action, A, dtype=jnp.float32)
    tempered = probs_with_temperature(result.action_probs, temperature)
    return jnp.where(temperature < 1e-3, greedy, tempered)


@functools.partial(
    jax.jit,
    static_argnames=("net", "num_simulations", "max_considered_actions",
                     "c_visit", "c_scale", "gumbel_scale", "max_depth",
                     "compat", "num_stages", "leaf_batch", "warm_discount"),
)
def run_gumbel_search(net, variables: Dict[str, Any],
                      root_states: env.EnvState, key: jax.Array, *,
                      num_simulations: int,
                      max_considered_actions: int = 16,
                      c_visit: float = 50.0, c_scale: float = 0.1,
                      gumbel_scale: float = 1.0, max_depth: int = 24,
                      compat: bool = False, num_stages: int = 6,
                      leaf_batch: int = 1,
                      warm_root: Optional[Tuple[jax.Array, jax.Array]] = None,
                      warm_discount: float = 1.0) -> GumbelResult:
    """Batched Gumbel search from ``root_states`` (leading batch axis B).

    ``gumbel_scale`` scales the root Gumbel draw: 1.0 for self-play
    exploration, 0.0 for deterministic evaluation/match play (the Gumbel
    analog of searching noise-free). ``leaf_batch`` rounds consume
    ``leaf_batch`` consecutive schedule entries per round (in-round picks
    count toward the prescribed-visit mask, so the halving schedule is
    honored exactly); descents below the root run in lockstep exactly as in
    the PUCT driver.

    ``warm_root``: optional ``(visits [B, A], vsum [B, A])`` seeding the
    root's edge stats from the previous move's search (1-level tree reuse,
    ``tree.root_child_warm_stats``). The sequential-halving *schedule* is
    masked on FRESH visit counts only (warm counts subtracted), so the
    budget allocation and the phase structure are exactly those of a cold
    search — but ``sigma``'s completed-Q uses warm+fresh evidence, so
    every halving decision (and the improved-policy target) is better
    informed. The winner is chosen among actions at the maximal FRESH
    count; reported ``visit_counts`` are fresh-only.
    """
    batch = root_states.to_move.shape[0]
    L = leaf_batch
    if L < 1 or num_simulations % L != 0:
        raise ValueError(
            f"num_simulations={num_simulations} must be a positive multiple "
            f"of leaf_batch={L}")
    num_rounds = num_simulations // L
    levels_cap = max(1, min(max_depth, num_simulations, 60))
    cv, cs = float(c_visit), float(c_scale)

    # --- root evaluation + Gumbel draw ----------------------------------
    prior, root_raw, legal = _evaluate(net, variables, root_states, compat)
    gkey, _ = jax.random.split(key)
    g = jnp.float32(gumbel_scale) * \
        jax.random.gumbel(gkey, (batch, A), jnp.float32)
    g = jnp.where(legal, g, _NEG)

    bounds = _stage_bounds(num_rounds, num_stages)
    trees = tree_lib.init_root(tree_lib.make_tree(batch, bounds[0] * L + 1),
                               root_states, prior, legal, root_raw)
    if warm_root is not None:
        warm_v = jnp.where(legal, jnp.maximum(
            warm_root[0].astype(jnp.float32), 0.0), 0.0)
        warm_s = warm_root[1].astype(jnp.float32)
        if warm_discount != 1.0:
            warm_v, warm_s = tree_lib.discount_warm(warm_v, warm_s,
                                                    warm_discount)
        trees = tree_lib.seed_root_stats(trees, warm_v, warm_s, legal)
    else:
        warm_v = None
    root_to_move = root_states.to_move
    root_row = trees.rows[:, 0, :]
    root_p, root_lg = tree_lib.decode_prior_legal(root_row)
    root_logits = _logits(root_p, root_lg)
    root_done = root_row[:, tree_lib.S_DONE] > 0.5
    root_value_col = root_row[:, tree_lib.S_VALUE]
    S = tree_lib.STRIDE

    # per-game halving schedule: games with m legal actions follow row
    # min(m, max_considered_actions) of the static table
    table = jnp.asarray(schedule_table(max_considered_actions,
                                       num_simulations))
    n_legal = root_lg.sum(-1).astype(jnp.int32)
    m_eff = jnp.minimum(n_legal, max_considered_actions)  # [B]

    def prescribed_round(round_index) -> jax.Array:
        """[B, L] prescribed root visit counts for the round's L schedule
        entries — ONE dynamic slice of the tiny table per round (dynamic-
        index ops carry a fixed ~30 us cost on TPU regardless of size;
        L separate column reads would pay it L times)."""
        cols = jax.lax.dynamic_slice(
            table, (0, round_index * L), (table.shape[0], L))  # [M+1, L]
        return jnp.take(cols, m_eff, axis=0).astype(jnp.float32)  # [B, L]

    def make_sim_round(levels):
      def sim_round(r, trees):
        # ---- root phase: schedule-masked Gumbel picks, VPU-only --------
        root_srow = trees.stats[:, :S]
        packed = root_srow[:, tree_lib.VISITS_OFF:tree_lib.VISITS_OFF + A]
        root_visits, root_child = tree_lib.unpack_visits_child(packed)
        root_vsum = root_srow[:, tree_lib.VSUM_OFF:tree_lib.VSUM_OFF + A]
        sigma = completed_q_sigma(root_visits, root_vsum, root_p, root_lg,
                                  root_value_col, cv, cs)
        score = g + root_logits + sigma  # frozen within the round
        root_extra = jnp.zeros((batch, A), jnp.float32)
        seq_round = prescribed_round(r)  # [B, L]

        # the halving schedule prescribes FRESH visit counts: a warm-seeded
        # root subtracts its warm counts so budget allocation matches a
        # cold search exactly (sigma above still sees warm+fresh evidence)
        fresh_base = (root_visits if warm_v is None
                      else root_visits - warm_v)
        a0s, child0s = [], []
        for l in range(L):
            visits_eff = fresh_base + root_extra
            eligible = root_lg & (visits_eff == seq_round[:, l:l + 1]) \
                & ~root_done[:, None]
            any_elig = eligible.any(-1)
            a = jnp.where(any_elig, _masked_argmax(score, eligible),
                          _masked_argmax(root_logits, root_lg))
            onehot_a = jax.nn.one_hot(a, A, dtype=jnp.float32)
            root_extra = root_extra + jnp.where(~root_done[:, None],
                                                onehot_a, 0.0)
            a0s.append(a)
            child0s.append((root_child * onehot_a).sum(-1).astype(jnp.int32))
        a0 = jnp.stack(a0s, -1)          # [B, L]
        child0 = jnp.stack(child0s, -1)  # [B, L]

        # ---- level-0 lane state + lockstep deep descent ----------------
        can0 = jnp.broadcast_to(~root_done[:, None], a0.shape)
        found = can0 & (child0 == 0)
        finishing = found | ~can0
        path_nodes = [jnp.where(can0, 0, -1).astype(jnp.int32)]
        path_actions = [jnp.where(can0, a0, 0)]
        path_tomove = [jnp.broadcast_to(
            root_row[:, tree_lib.S_TO_MOVE][:, None], a0.shape)]
        leaf = jnp.zeros_like(a0)
        leaf_action = jnp.where(found, a0, -1)
        eval_row = jnp.broadcast_to(root_row[:, None, :],
                                    (batch, L, root_row.shape[-1]))
        alive = ~finishing
        node = jnp.where(alive, child0, 0)

        for _level in range(1, levels):
            row, srow = tree_lib.gather_node(trees, node)  # [B, L, K/S]
            p, lg = tree_lib.decode_prior_legal(row)
            done_n = row[..., tree_lib.S_DONE] > 0.5
            tomove_n = row[..., tree_lib.S_TO_MOVE]
            packed_n = srow[..., tree_lib.VISITS_OFF:tree_lib.VISITS_OFF + A]
            visits, child = tree_lib.unpack_visits_child(packed_n)
            vsum = srow[..., tree_lib.VSUM_OFF:tree_lib.VSUM_OFF + A]

            # deterministic interior rule: argmax pi' - N/(1 + sum N)
            sig = completed_q_sigma(visits, vsum, p, lg,
                                    row[..., tree_lib.S_VALUE], cv, cs)
            pi = jax.nn.softmax(
                jnp.where(lg, _logits(p, lg) + sig, _NEG), axis=-1)
            score_n = pi - visits / (1.0 + visits.sum(-1, keepdims=True))
            a = _masked_argmax(score_n, lg)
            onehot_a = jax.nn.one_hot(a, A, dtype=jnp.float32)
            child_idx = (child * onehot_a).sum(-1).astype(jnp.int32)

            can_step = alive & ~done_n
            found = can_step & (child_idx == 0)
            hit_terminal = alive & done_n
            path_nodes.append(jnp.where(can_step, node, -1))
            path_actions.append(jnp.where(can_step, a, 0))
            path_tomove.append(tomove_n)

            finishing = found | hit_terminal
            eval_row = jnp.where(finishing[..., None], row, eval_row)
            leaf = jnp.where(found, node, leaf)
            leaf_action = jnp.where(found, a, leaf_action)
            alive = alive & ~finishing
            node = jnp.where(alive, child_idx, node)

        trow, _ = tree_lib.gather_node(trees, node)
        eval_row = jnp.where(alive[..., None], trow, eval_row)

        pn = jnp.stack(path_nodes, -1).reshape(batch, L * levels)
        pa = jnp.stack(path_actions, -1).reshape(batch, L * levels)
        pt = jnp.stack(path_tomove, -1).reshape(batch, L * levels)

        return expand_and_backup(
            net, variables, trees, pn, pa, pt, leaf, leaf_action,
            eval_row, r * L + 1, root_to_move, compat)

      return sim_round

    start = 0
    for end in bounds:
        if start > 0:
            trees = _grow_tree(trees, end * L + 1)
        trees = jax.lax.fori_loop(
            start, end, make_sim_round(max(1, min(levels_cap, end))), trees)
        start = end

    # --- outputs ---------------------------------------------------------
    final_srow = trees.stats[:, :S]
    packed = final_srow[:, tree_lib.VISITS_OFF:tree_lib.VISITS_OFF + A]
    visit_counts_f, _ = tree_lib.unpack_visits_child(packed)
    root_vsum = final_srow[:, tree_lib.VSUM_OFF:tree_lib.VSUM_OFF + A]
    sigma = completed_q_sigma(visit_counts_f, root_vsum, root_p, root_lg,
                              root_value_col, cv, cs)
    if warm_v is not None:
        visit_counts_f = visit_counts_f - warm_v  # report fresh only

    # the move: argmax of g + logits + sigma among the maximally visited
    # root actions (the halving survivors, by fresh count); fallback to all
    # legal
    max_count = jnp.where(root_lg, visit_counts_f, -1.0).max(-1,
                                                             keepdims=True)
    survivors = root_lg & (visit_counts_f == max_count)
    final_score = g + root_logits + sigma
    chosen = jnp.where(survivors.any(-1),
                       _masked_argmax(final_score, survivors),
                       _masked_argmax(final_score, root_lg))

    # the training target: the improved policy (noise-free)
    improved = jax.nn.softmax(
        jnp.where(root_lg, root_logits + sigma, _NEG), axis=-1)
    improved = jnp.where(root_lg, improved, 0.0)
    improved = improved / jnp.maximum(improved.sum(-1, keepdims=True), 1e-12)

    return GumbelResult(
        visit_counts=visit_counts_f.astype(jnp.int32),
        action_probs=improved,
        chosen_action=chosen,
        root_value=tree_lib.root_value(trees),
        tree=trees,
    )
