"""Batched on-device arena: head-to-head evaluation and round-robin ELO
tournaments.

Replaces ``Arena`` / ``ELOPlayer`` (/root/reference/src/arena/arena.py:138-409).
The reference plays one game at a time on the host, with a fresh Python MCTS
per player per move; here a whole pairing's games run **batched in one jitted
program** — colors alternated across the batch, both players' searches
evaluated as full-batch MXU forwards each move slot, the mover's distribution
selected per game with a ``where``. ELO bookkeeping stays host-side
(``elo.ELORatingSystem``), updated per game as the reference does
(arena.py:347).

Divergence (documented): ``ELOPlayer.get_move`` hard-codes ``temperature=1.0``
(arena.py:185), silently ignoring the 0.1 the pipeline passes
(pipeline.py:391). Here the configured tournament temperature is honored.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import TournamentConfig
from .elo import ELORatingSystem
from .env import bitboard as env
from .mcts import gumbel as gumbel_lib
from .mcts import search as search_lib
from .parallel import mesh as mesh_lib


class Player(NamedTuple):
    """A tournament participant: a model (variables) or the random baseline
    (``variables=None`` — arena.py:177-180)."""

    name: str
    variables: Optional[Dict[str, Any]] = None


def _random_probs(states: env.EnvState, compat: bool) -> jax.Array:
    """Uniform distribution over legal actions (the random baseline,
    arena.py:179-180)."""
    legal = env.legal_action_mask(states, compat=compat).astype(jnp.float32)
    return legal / jnp.maximum(legal.sum(axis=-1, keepdims=True), 1e-9)


def _score_a(final: env.EnvState, a_color: jax.Array) -> jax.Array:
    """Per-game score for A: 1.0 win / 0.5 draw / 0.0 loss (arena.py:264-270).
    Games still unfinished at the ply cap are scored by piece count (the
    batch analog of the reference's max-moves cutoff)."""
    nb, nw = env.score(final)
    count_winner = jnp.where(nb > nw, env.BLACK,
                             jnp.where(nw > nb, env.WHITE, 0)).astype(jnp.int32)
    winner = jnp.where(final.done, final.winner, count_winner)
    return jnp.where(winner == a_color, 1.0,
                     jnp.where(winner == 0, 0.5, 0.0)).astype(jnp.float32)


def _make_side_probs(net, *, num_simulations: int, c_puct: float,
                     temperature: float, max_depth: int, compat: bool,
                     leaf_batch: int = 1, algorithm: str = "puct",
                     max_considered_actions: int = 16, c_visit: float = 50.0,
                     c_scale: float = 0.1, warm_discount: float = 1.0):
    """Policy for one side: full MCTS at the tournament temperature, or the
    uniform random baseline (arena.py:177-188).

    ``algorithm="gumbel"`` plays with the deterministic Gumbel search
    (``gumbel_scale=0`` — the match-play analog of a noise-free PUCT
    search): at ~zero temperature the move is the sequential-halving
    winner; at higher temperatures actions sample from the tempered
    improved policy (``gumbel.play_probs``).

    The returned callable takes an optional ``warm`` root-stat pair
    (1-level tree reuse, ``mcts.tree.warm_stats_after``) and returns
    ``(probs, stats)`` where ``stats`` is the finished search's flat tree
    stats array (for the caller's reuse carry; ``None`` for the random
    baseline, whose play is search-free)."""
    if algorithm not in ("puct", "gumbel"):
        raise ValueError(f"unknown search algorithm {algorithm!r}")

    def side_probs(states, skey, variables, is_random: bool, warm=None):
        if is_random:
            return _random_probs(states, compat), None
        if algorithm == "gumbel":
            gres = gumbel_lib.run_gumbel_search(
                net, variables, states, skey,
                num_simulations=num_simulations,
                max_considered_actions=max_considered_actions,
                c_visit=c_visit, c_scale=c_scale, gumbel_scale=0.0,
                max_depth=max_depth, compat=compat, leaf_batch=leaf_batch,
                warm_root=warm, warm_discount=warm_discount)
            return gumbel_lib.play_probs(gres, temperature), gres.tree.stats
        result = search_lib.run_search(
            net, variables, states, skey,
            num_simulations=num_simulations, c_puct=c_puct,
            dirichlet_alpha=0.3, dirichlet_epsilon=0.0,
            max_depth=max_depth, compat=compat, add_noise=False,
            leaf_batch=leaf_batch, warm_root=warm,
            warm_discount=warm_discount)
        return search_lib.probs_with_temperature(
            result.visit_counts, jnp.float32(temperature)), result.tree.stats

    return side_probs


def _constrain_states(mesh: Optional[Mesh], states: env.EnvState) -> env.EnvState:
    """Pin an [n]-leaved state batch to the mesh's ``data`` axis (or
    replicated when n doesn't divide it). Applied at creation AND at every
    ply's output so a scan carry keeps the layout; ``mesh=None`` is the
    identity."""
    if mesh is None:
        return states
    n = states.done.shape[0]
    d = mesh.shape[mesh_lib.DATA_AXIS]
    spec = P(mesh_lib.DATA_AXIS) if (n % d == 0 and n > 0) else P()
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sh), states)


@functools.partial(
    jax.jit,
    static_argnames=("net", "num_games", "num_simulations", "max_depth",
                     "max_moves", "compat", "a_random", "b_random",
                     "pass_slack", "return_final", "num_simulations_b",
                     "leaf_batch", "leaf_batch_b", "algorithm",
                     "algorithm_b", "max_considered_actions", "c_visit",
                     "c_scale", "black_games", "mesh", "tree_reuse",
                     "tree_reuse_b", "tree_reuse_discount",
                     "tree_reuse_discount_b"),
)
def _play_pair_parts(net, vars_a, vars_b, key: jax.Array, *, num_games: int,
                     num_simulations: int, c_puct: float, temperature: float,
                     max_depth: int = 64, max_moves: int = 60,
                     compat: bool = False,
                     a_random: bool = False, b_random: bool = False,
                     pass_slack: int = 16, return_final: bool = False,
                     num_simulations_b: Optional[int] = None,
                     leaf_batch: int = 1,
                     leaf_batch_b: Optional[int] = None,
                     algorithm: str = "puct",
                     algorithm_b: Optional[str] = None,
                     max_considered_actions: int = 16, c_visit: float = 50.0,
                     c_scale: float = 0.1,
                     black_games: Optional[int] = None,
                     mesh: Optional[Mesh] = None,
                     tree_reuse: str = "off",
                     tree_reuse_b: Optional[str] = None,
                     tree_reuse_discount: float = 1.0,
                     tree_reuse_discount_b: Optional[float] = None):
    """Play ``num_games`` games of A vs B, searching only for the mover.

    A plays BLACK in the first ``num_games // 2`` games and WHITE in the rest
    (the batched form of the reference's per-round color alternation,
    arena.py:339-341). Every game starts with BLACK to move, and the mover's
    *color* strictly alternates by ply except across auto-passes, so at ply
    ``t`` the scheduled color is known statically — each half of the batch
    needs exactly ONE half-batch search (A's net on the half where A owns the
    scheduled color, B's on the other). That is half the search FLOPs of
    running both players' searches full-batch and discarding the non-mover's
    (the round-1 implementation — VERDICT item 8). A game whose mover
    diverges from the schedule (an auto-pass gives one player two plies in a
    row) stalls for exactly one ply and realigns, so the ply budget is
    ``max_moves + pass_slack`` instead of ``max_moves``: one slack ply per
    auto-pass event. The default 16 covers any plausible game (pass-heavy
    endgames rarely exceed ~4 events); a game that still exhausts the
    budget is scored by piece count at the cutoff, i.e. the ``max_moves``
    draw-cutoff semantics (SURVEY §2.4).

    Returns ``score_a`` per game: 1.0 win / 0.5 draw / 0.0 loss
    (arena.py:264-270 scoring).

    ``black_games`` overrides the half/half color split: A plays BLACK in
    the first ``black_games`` games and WHITE in the rest (0 and
    ``num_games`` give single-color batches). Used by the sharded
    multi-process tournament, whose work units are (pairing, color-half)
    slices (``Arena.run_tournament_sharded``). Default None keeps the even
    half/half split.

    ``tree_reuse`` / ``tree_reuse_b`` ("off" | "root", per side): 1-level
    tree reuse across a side's consecutive searches. In alternating play a
    side's next root is the *grandchild* of its previous one (own move,
    then the opponent's reply), so each reusing side's scan carry holds its
    last search's flat tree stats plus the two actions since; the warm pair
    is extracted per ply with ``mcts.tree.warm_stats_after`` and seeds the
    next search (``warm_root`` semantics — fresh budgets, warm Q). A side
    whose opponent moved twice since its last search (auto-pass
    realignment) invalidates its carry and searches cold. ``tree_reuse_b``
    ``None`` mirrors ``tree_reuse``; asymmetric settings measure the
    strength effect at equal simulations (refbench/reuse_strength.py).

    ``mesh`` (static) shards each color-half's game batch over the mesh's
    ``data`` axis (VERDICT r4 item 1 — the reference analog being scaled is
    /root/reference/src/arena/arena.py:288-389): the two halves are
    independent state batches, each constrained to ``P("data")``, so every
    per-ply search runs as a full-mesh SPMD computation with zero
    collectives (same compile-level property as sharded self-play —
    asserted on the optimized HLO by
    ``tests/test_arena_sharded.py``). A half whose game count does not
    divide the data axis falls back to replicated placement for that half
    (correct, but redundant compute — size game counts to multiples of the
    axis). Results are bit-identical to ``mesh=None``: sharding is a
    placement decision, not a math change.
    """
    if black_games is None:
        if num_games % 2 != 0:
            raise ValueError(
                f"num_games={num_games} must be even (color split)")
        half = num_games // 2
    else:
        if not 0 <= black_games <= num_games:
            raise ValueError(
                f"black_games={black_games} outside [0, {num_games}]")
        half = black_games

    def constrain(states: env.EnvState) -> env.EnvState:
        return _constrain_states(mesh, states)

    # the two color-halves are INDEPENDENT state batches (A-as-BLACK games,
    # A-as-WHITE games) rather than slices of one array: each half can then
    # be sharded over the whole data axis on its own, so a mesh splits the
    # search work of BOTH halves across every chip
    part_colors = tuple(c for c, n in
                        ((env.BLACK, half), (env.WHITE, num_games - half))
                        if n > 0)
    parts = tuple(constrain(env.initial_state((n,)))
                  for n in (half, num_games - half) if n > 0)
    # per-side search settings (defaults: symmetric). Asymmetric settings
    # turn the arena into a handicap/ablation harness — e.g. measuring the
    # strength cost of multi-leaf rounds (leaf_batch vs leaf_batch_b at
    # equal sims, refbench/leafbatch_quality.py) or Gumbel-vs-PUCT at
    # matched budgets (algorithm vs algorithm_b, refbench/gumbel_strength.py).
    gumbel_kw = dict(max_considered_actions=max_considered_actions,
                     c_visit=c_visit, c_scale=c_scale)
    probs_a_fn = _make_side_probs(
        net, num_simulations=num_simulations, c_puct=c_puct,
        temperature=temperature, max_depth=max_depth, compat=compat,
        leaf_batch=leaf_batch, algorithm=algorithm,
        warm_discount=tree_reuse_discount, **gumbel_kw)
    probs_b_fn = _make_side_probs(
        net,
        num_simulations=(num_simulations if num_simulations_b is None
                         else num_simulations_b),
        c_puct=c_puct, temperature=temperature, max_depth=max_depth,
        compat=compat,
        leaf_batch=leaf_batch if leaf_batch_b is None else leaf_batch_b,
        algorithm=algorithm if algorithm_b is None else algorithm_b,
        warm_discount=(tree_reuse_discount if tree_reuse_discount_b is None
                       else tree_reuse_discount_b),
        **gumbel_kw)

    from .mcts import tree as tree_lib

    reuse_flags = (tree_reuse == "root",
                   (tree_reuse if tree_reuse_b is None
                    else tree_reuse_b) == "root")
    for mode in (tree_reuse, tree_reuse_b):
        if mode not in ("off", "root", None):
            raise ValueError(f"unknown tree_reuse mode {mode!r}")
    side_random = (a_random, b_random)
    side_sims = (num_simulations,
                 num_simulations if num_simulations_b is None
                 else num_simulations_b)

    def init_carries():
        """Per part, per side: (stats, a_self, a_opp) — the side's last
        search tree stats plus the actions since — or None (no reuse, or
        the search-free random baseline)."""
        carries = []
        for states in parts:
            n = states.done.shape[0]
            per_side = []
            for s in range(2):
                if not reuse_flags[s] or side_random[s]:
                    per_side.append(None)
                    continue
                width = (side_sims[s] + 1) * tree_lib.STRIDE
                per_side.append((jnp.zeros((n, width), jnp.float32),
                                 jnp.full((n,), -1, jnp.int32),
                                 jnp.full((n,), -1, jnp.int32)))
            carries.append(tuple(per_side))
        return tuple(carries)

    def half_ply(parts, carries, step_key, sched_color: int):
        """One ply at statically-known scheduled color: each color-half
        searches with exactly ONE player's settings (A's where A owns the
        scheduled color, B's otherwise), moves applied only where the
        game's actual mover matches the schedule."""
        subkeys = jax.random.split(step_key, 2 * len(parts))
        out, out_carries = [], []
        for i, (states, a_col) in enumerate(zip(parts, part_colors)):
            k_search, k_sample = subkeys[2 * i], subkeys[2 * i + 1]
            mover = 0 if a_col == sched_color else 1  # 0 = A, 1 = B
            cm = carries[i][mover]
            warm = (tree_lib.warm_stats_after(*cm)
                    if cm is not None else None)
            if mover == 0:
                probs, stats_new = probs_a_fn(states, k_search, vars_a,
                                              a_random, warm)
            else:
                probs, stats_new = probs_b_fn(states, k_search, vars_b,
                                              b_random, warm)
            actions = search_lib.sample_actions(k_sample, probs)
            move_ok = (states.to_move == sched_color) & ~states.done
            new_states, _ = env.step(states, actions, compat=compat)
            out.append(constrain(jax.tree_util.tree_map(
                lambda new, old: jnp.where(move_ok, new, old),
                new_states, states)))

            new_sides = list(carries[i])
            if cm is not None and stats_new is not None:
                stats, a_self, a_opp = cm
                new_sides[mover] = (
                    jnp.where(move_ok[:, None], stats_new, stats),
                    jnp.where(move_ok, actions, a_self),
                    jnp.where(move_ok, -1, a_opp))
            co = carries[i][1 - mover]
            if co is not None:
                stats_o, a_self_o, a_opp_o = co
                # a second mover move since the opponent's search (auto-
                # pass realignment) outruns the 2-ply carry: invalidate
                invalid = move_ok & (a_opp_o >= 0)
                new_sides[1 - mover] = (
                    stats_o,
                    jnp.where(invalid, -1, a_self_o),
                    jnp.where(invalid, -1,
                              jnp.where(move_ok, actions, a_opp_o)))
            out_carries.append(tuple(new_sides))
        return tuple(out), tuple(out_carries)

    def ply_pair(carry, pair_key):
        parts, carries = carry
        kb, kw = jax.random.split(pair_key)
        parts, carries = half_ply(parts, carries, kb, env.BLACK)
        parts, carries = half_ply(parts, carries, kw, env.WHITE)
        return (parts, carries), None

    num_pairs = (max_moves + pass_slack + 1) // 2
    pair_keys = jax.random.split(key, num_pairs)
    (final_parts, _), _ = jax.lax.scan(ply_pair, (parts, init_carries()),
                                       pair_keys)
    score_parts = tuple(_score_a(f, jnp.int32(c))
                        for f, c in zip(final_parts, part_colors))
    # parts stay separate INSIDE the program: concatenating two
    # data-sharded halves on device would force the program's only
    # collective (an all-gather of the tiny score vector); the host
    # wrapper (``play_pair``) concatenates after the fetch instead, so the
    # compiled program is collective-free end to end (HLO-asserted).
    return (score_parts, final_parts) if return_final else score_parts


def play_pair(net, vars_a, vars_b, key: jax.Array, **kwargs):
    """Host wrapper of the jitted per-half program (``_play_pair_parts``):
    ONE compiled dispatch, then a numpy concatenation of the color-halves'
    results. Returns ``score_a`` per game as ``np.ndarray`` — 1.0 win /
    0.5 draw / 0.0 loss for A, A-as-BLACK games first (arena.py:264-270
    scoring); ``return_final=True`` additionally returns the concatenated
    final ``EnvState``."""
    out = _play_pair_parts(net, vars_a, vars_b, key, **kwargs)
    if kwargs.get("return_final"):
        score_parts, final_parts = out
        final = jax.tree_util.tree_map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
            *final_parts)
        return _np_concat(score_parts), final
    return _np_concat(out)


def _np_concat(parts) -> np.ndarray:
    return np.concatenate([np.asarray(p) for p in parts], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("net", "num_games", "num_simulations", "max_depth",
                     "max_moves", "compat", "a_random", "b_random"),
)
def play_pair_lockstep(net, vars_a, vars_b, key: jax.Array, *, num_games: int,
                       num_simulations: int, c_puct: float, temperature: float,
                       max_depth: int = 64, max_moves: int = 60,
                       compat: bool = False, a_random: bool = False,
                       b_random: bool = False) -> jax.Array:
    """Round-1 arena kernel: both players' searches run full-batch every ply
    and the non-mover's is discarded. 2x the search cost of ``play_pair``;
    kept as the test oracle — under deterministic play (temperature ~0) the
    two must produce identical game outcomes (same color split)."""
    half = num_games // 2
    a_color = jnp.where(jnp.arange(num_games) < half, env.BLACK,
                        env.WHITE).astype(jnp.int32)
    states = env.initial_state((num_games,))
    side_probs = _make_side_probs(
        net, num_simulations=num_simulations, c_puct=c_puct,
        temperature=temperature, max_depth=max_depth, compat=compat)

    def move_step(states, step_key):
        ka, kb, ks = jax.random.split(step_key, 3)
        probs_a, _ = side_probs(states, ka, vars_a, a_random)
        probs_b, _ = side_probs(states, kb, vars_b, b_random)
        mover_is_a = (states.to_move == a_color)[:, None]
        probs = jnp.where(mover_is_a, probs_a, probs_b)
        actions = search_lib.sample_actions(ks, probs)
        new_states, _ = env.step(states, actions, compat=compat)
        new_states = jax.tree_util.tree_map(
            lambda new, old: jnp.where(states.done, old, new),
            new_states, states)
        return new_states, None

    step_keys = jax.random.split(key, max_moves)
    final, _ = jax.lax.scan(move_step, states, step_keys)
    return _score_a(final, a_color)


@functools.partial(
    jax.jit,
    static_argnames=("net", "units", "random_mask", "num_simulations",
                     "max_depth", "max_moves", "compat", "pass_slack",
                     "leaf_batch", "algorithm", "max_considered_actions",
                     "c_visit", "c_scale", "mesh", "tree_reuse",
                     "tree_reuse_discount"),
)
def _play_units_parts(net, models, unit_keys, *, units, random_mask,
                      num_simulations: int, c_puct: float,
                      temperature: float, max_depth: int = 64,
                      max_moves: int = 60, compat: bool = False,
                      pass_slack: int = 16, leaf_batch: int = 1,
                      algorithm: str = "puct",
                      max_considered_actions: int = 16, c_visit: float = 50.0,
                      c_scale: float = 0.1, mesh: Optional[Mesh] = None,
                      tree_reuse: str = "off",
                      tree_reuse_discount: float = 1.0):
    """Play EVERY (pairing, color-half) tournament unit in ONE compiled
    program, sharing each ply's searches across pairings (the PERF.md r5
    "merge the gate's pairings" lever; reference analog — the per-match
    host loop being batched away: /root/reference/src/arena/arena.py:288-389).

    ``units`` (static): tuple of ``(a_idx, b_idx, num_games, a_color)``
    single-color work units — indices into ``models``, the unit's game
    count, and the color A plays for the whole unit (the
    ``Arena._tournament_units`` decomposition). ``models`` (traced): one
    variables pytree per distinct player, ``None`` for the random
    baseline; ``random_mask`` (static) marks which entries are random.
    ``unit_keys``: stacked per-unit PRNG keys, row u driving unit u.

    Sharing structure: every game starts with BLACK to move and the
    scheduled mover color alternates by ply, so at a given half-ply each
    unit's searcher is a statically-known model index (``a_idx`` when the
    unit's A-color owns the scheduled color, else ``b_idx``). Units with
    the same searcher CONCATENATE into one search batch — one net search
    per distinct model per half-ply instead of one per unit. For the
    promotion gate (players current/best/random; 6 units) that is 2
    searches per half-ply at 2x the batch instead of 4 at 1x: half the
    per-ply fixed costs, which dominate at gate-sized batches (round cost
    is ~flat in B — PERF.md), plus 3 dispatches -> 1.

    Per-unit RNG streams replicate ``_play_pair_parts``'s exactly (the
    same split chain per unit: ``split(ukey, num_pairs)`` then
    ``kb, kw = split(pair_key)`` then ``k_search, k_sample =
    split(step_key, 2)``), and arena searches are key-free (PUCT with
    ``add_noise=False``; Gumbel at ``gumbel_scale=0``), so each unit's
    outcome matches its standalone ``play_pair(black_games=...)`` run —
    bit-exactly for random players, and up to batch-concat numerics (same
    math, larger rows) for net searches. Move application, pass_slack
    realignment, scoring, mesh constraint, and ``tree_reuse="root"``
    grandchild carries all follow ``_play_pair_parts`` (each unit keeps
    its own per-side carry; group searches concatenate the movers'
    carries before the warm-stat extraction).

    Returns a tuple of per-unit score arrays (``_score_a`` semantics).
    """
    from .mcts import tree as tree_lib

    n_units = len(units)
    if n_units == 0:
        return ()
    for a_idx, b_idx, n, a_col in units:
        if n <= 0:
            raise ValueError(f"unit game count {n} must be positive")
        if a_col not in (env.BLACK, env.WHITE):
            raise ValueError(f"unit a_color {a_col} not BLACK/WHITE")
        for m_idx in (a_idx, b_idx):
            if not 0 <= m_idx < len(models):
                raise ValueError(f"unit model index {m_idx} out of range")
    if tree_reuse not in ("off", "root"):
        raise ValueError(f"unknown tree_reuse mode {tree_reuse!r}")
    reuse = tree_reuse == "root"

    side_probs = _make_side_probs(
        net, num_simulations=num_simulations, c_puct=c_puct,
        temperature=temperature, max_depth=max_depth, compat=compat,
        leaf_batch=leaf_batch, algorithm=algorithm,
        max_considered_actions=max_considered_actions, c_visit=c_visit,
        c_scale=c_scale, warm_discount=tree_reuse_discount)

    parts0 = tuple(_constrain_states(mesh, env.initial_state((n,)))
                   for (_, _, n, _) in units)
    width = (num_simulations + 1) * tree_lib.STRIDE

    def init_carries():
        carries = []
        for a_idx, b_idx, n, _ in units:
            per_side = []
            for m_idx in (a_idx, b_idx):
                if not reuse or random_mask[m_idx]:
                    per_side.append(None)
                    continue
                per_side.append((jnp.zeros((n, width), jnp.float32),
                                 jnp.full((n,), -1, jnp.int32),
                                 jnp.full((n,), -1, jnp.int32)))
            carries.append(tuple(per_side))
        return tuple(carries)

    def groups_for(sched_color: int):
        """Static searcher grouping: model index -> units it moves for at
        this scheduled color, in unit order (deterministic trace)."""
        groups: Dict[int, List[int]] = {}
        for u, (a_idx, b_idx, _, a_col) in enumerate(units):
            m_idx = a_idx if a_col == sched_color else b_idx
            groups.setdefault(m_idx, []).append(u)
        return sorted(groups.items())

    mesh_d = mesh.shape[mesh_lib.DATA_AXIS] if mesh is not None else 1

    def group_cat(us):
        """Concat/split for one search group's unit batches. On a mesh,
        plain ``jnp.concatenate`` of data-sharded unit batches is a
        cross-shard RESHARD (device d owns a contiguous slice of the
        concatenated array, which interleaves pieces of every unit's
        shards — GSPMD inserts all-gather/collective-permute). The
        shard-BLOCK interleaved layout avoids it: reshape each unit to
        ``[d, n/d, ...]`` (sharded on the leading axis), concat on axis 1
        (local), flatten back — device d then owns exactly its own block
        of every unit, zero communication. Per-game math is order-
        independent, and ``split`` inverts the same layout, so results
        are identical to the plain concat (and HLO-asserted
        collective-free, tests/test_arena_merged.py)."""
        sizes = [units[u][2] for u in us]
        total = sum(sizes)
        inter = (mesh_d > 1 and all(n % mesh_d == 0 for n in sizes)
                 and len(us) > 1)

        def cat(*xs):
            if len(xs) == 1:
                return xs[0]
            if not inter:
                return jnp.concatenate(xs, axis=0)
            blocks = [x.reshape((mesh_d, x.shape[0] // mesh_d)
                                + x.shape[1:]) for x in xs]
            return jnp.concatenate(blocks, axis=1).reshape(
                (total,) + xs[0].shape[1:])

        def split(y):
            if len(us) == 1:
                return {us[0]: y}
            out = {}
            if not inter:
                off = 0
                for u, n in zip(us, sizes):
                    out[u] = y[off:off + n]
                    off += n
                return out
            yb = y.reshape((mesh_d, total // mesh_d) + y.shape[1:])
            off = 0
            for u, n in zip(us, sizes):
                out[u] = yb[:, off:off + n // mesh_d].reshape(
                    (n,) + y.shape[1:])
                off += n // mesh_d
            return out

        return cat, split, inter

    def half_ply(parts, carries, step_keys, sched_color: int):
        sub = [jax.random.split(step_keys[u], 2) for u in range(n_units)]
        probs_p: List[Any] = [None] * n_units
        stats_p: List[Any] = [None] * n_units
        for m_idx, us in groups_for(sched_color):
            if random_mask[m_idx]:
                for u in us:
                    probs_p[u] = _random_probs(parts[u], compat)
                continue
            cat, split, inter = group_cat(us)
            states_cat = jax.tree_util.tree_map(
                cat, *(parts[u] for u in us))
            if inter:
                states_cat = _constrain_states(mesh, states_cat)
            warm = None
            if reuse:
                comps = [carries[u][0 if units[u][3] == sched_color else 1]
                         for u in us]
                warm = tree_lib.warm_stats_after(
                    *(cat(*(c[i] for c in comps)) for i in range(3)))
            probs_cat, stats_cat = side_probs(
                states_cat, sub[us[0]][0], models[m_idx], False, warm)
            probs_split = split(probs_cat)
            stats_split = (split(stats_cat) if stats_cat is not None
                           else None)
            for u in us:
                probs_p[u] = probs_split[u]
                if stats_split is not None:
                    stats_p[u] = stats_split[u]
        out_parts, out_carries = [], []
        for u, (a_idx, b_idx, n, a_col) in enumerate(units):
            states = parts[u]
            actions = search_lib.sample_actions(sub[u][1], probs_p[u])
            move_ok = (states.to_move == sched_color) & ~states.done
            new_states, _ = env.step(states, actions, compat=compat)
            out_parts.append(_constrain_states(mesh, jax.tree_util.tree_map(
                lambda new, old: jnp.where(move_ok, new, old),
                new_states, states)))
            mover = 0 if a_col == sched_color else 1
            new_sides = list(carries[u])
            cm = carries[u][mover]
            if cm is not None and stats_p[u] is not None:
                stats, a_self, a_opp = cm
                new_sides[mover] = (
                    jnp.where(move_ok[:, None], stats_p[u], stats),
                    jnp.where(move_ok, actions, a_self),
                    jnp.where(move_ok, -1, a_opp))
            co = carries[u][1 - mover]
            if co is not None:
                stats_o, a_self_o, a_opp_o = co
                invalid = move_ok & (a_opp_o >= 0)
                new_sides[1 - mover] = (
                    stats_o,
                    jnp.where(invalid, -1, a_self_o),
                    jnp.where(invalid, -1,
                              jnp.where(move_ok, actions, a_opp_o)))
            out_carries.append(tuple(new_sides))
        return tuple(out_parts), tuple(out_carries)

    def ply_pair(carry, pair_keys_t):
        parts, carries = carry
        kb_kw = [jax.random.split(pair_keys_t[u]) for u in range(n_units)]
        kb = jnp.stack([kk[0] for kk in kb_kw])
        kw = jnp.stack([kk[1] for kk in kb_kw])
        parts, carries = half_ply(parts, carries, kb, env.BLACK)
        parts, carries = half_ply(parts, carries, kw, env.WHITE)
        return (parts, carries), None

    num_pairs = (max_moves + pass_slack + 1) // 2
    xs = jnp.stack([jax.random.split(unit_keys[u], num_pairs)
                    for u in range(n_units)], axis=1)  # [num_pairs, U, key]
    (final_parts, _), _ = jax.lax.scan(ply_pair, (parts0, init_carries()),
                                       xs)
    return tuple(_score_a(f, jnp.int32(units[u][3]))
                 for u, f in enumerate(final_parts))


def play_units(net, models, units, unit_keys, **kwargs) -> List[np.ndarray]:
    """Host wrapper of :func:`_play_units_parts`: ONE compiled dispatch for
    a whole list of single-color tournament units. ``models`` a sequence of
    variables pytrees (``None`` = random baseline), ``units`` a sequence of
    ``(a_idx, b_idx, num_games, a_color)``, ``unit_keys`` one PRNG key per
    unit. Returns per-unit ``score_a`` arrays (``play_pair`` scoring)."""
    out = _play_units_parts(net, tuple(models), jnp.stack(list(unit_keys)),
                            units=tuple(tuple(u) for u in units), **kwargs)
    return [np.asarray(s) for s in out]


class Arena:
    """Round-robin tournament league (arena.py:200-409).

    ``mesh``: shard every match's game batch over the mesh's ``data`` axis
    (``play_pair mesh`` semantics). Single-controller pipelines pass their
    device mesh; multi-process pipelines pass a process-LOCAL mesh
    (``local_eval_mesh``) so each process's tournament units use all of its
    local chips instead of one. ``None`` = unsharded (single device).
    """

    def __init__(self, net, config: TournamentConfig, compat: bool = False,
                 mesh: Optional[Mesh] = None):
        self.net = net
        self.config = config
        self.compat = compat
        self.mesh = mesh if (
            mesh is not None
            and mesh.shape[mesh_lib.DATA_AXIS] > 1) else None
        self.elo = ELORatingSystem(k=config.elo_k_factor,
                                   initial_rating=config.elo_initial)
        self.players: List[Player] = []

    def add_player(self, name: str,
                   variables: Optional[Dict[str, Any]] = None,
                   rating: Optional[float] = None) -> None:
        if variables is not None and self.mesh is not None:
            # replicate once at registration (a no-op when the caller's
            # tree is already mesh-replicated, e.g. learner.variables)
            variables = mesh_lib.replicate(self.mesh, variables)
        self.players.append(Player(name=name, variables=variables))
        self.elo.add_player(name, rating)

    def play_games(self, a: Player, b: Player, key: jax.Array,
                   num_games: int,
                   black_games: Optional[int] = None) -> np.ndarray:
        """Batched A-vs-B match; returns per-game scores for A."""
        cfg = self.config
        scores = play_pair(
            self.net, a.variables, b.variables, key,
            num_games=num_games,
            num_simulations=cfg.num_simulations,
            c_puct=cfg.c_puct,
            temperature=cfg.temperature,
            compat=self.compat,
            a_random=a.variables is None,
            b_random=b.variables is None,
            algorithm=cfg.algorithm,
            max_considered_actions=cfg.max_considered_actions,
            c_visit=cfg.c_visit,
            c_scale=cfg.c_scale,
            black_games=black_games,
            mesh=self.mesh,
            tree_reuse=getattr(cfg, "tree_reuse", "off"),
            tree_reuse_discount=getattr(cfg, "tree_reuse_discount", 1.0))
        return np.asarray(scores)

    def play_units_merged(self, units) -> List[np.ndarray]:
        """Play a list of ``_tournament_units`` work units —
        ``(i, j, num_games, black_games, ukey)`` with ``black_games`` in
        ``{0, num_games}`` — as ONE merged device program
        (:func:`play_units`), sharing searches across pairings. Returns
        per-unit score arrays in input order."""
        cfg = self.config
        models = tuple(p.variables for p in self.players)
        spec = []
        keys = []
        for i, j, ng, bg, ukey in units:
            if bg not in (0, ng):
                raise ValueError(
                    f"merged units must be single-color (black_games={bg}, "
                    f"num_games={ng})")
            spec.append((i, j, ng, int(env.BLACK) if bg else int(env.WHITE)))
            keys.append(ukey)
        return play_units(
            self.net, models, spec, keys,
            random_mask=tuple(v is None for v in models),
            num_simulations=cfg.num_simulations, c_puct=cfg.c_puct,
            temperature=cfg.temperature, compat=self.compat,
            algorithm=cfg.algorithm,
            max_considered_actions=cfg.max_considered_actions,
            c_visit=cfg.c_visit, c_scale=cfg.c_scale, mesh=self.mesh,
            tree_reuse=getattr(cfg, "tree_reuse", "off"),
            tree_reuse_discount=getattr(cfg, "tree_reuse_discount", 1.0))

    def run_tournament(self, key: jax.Array,
                       rounds: Optional[int] = None) -> List[Dict]:
        """Every pair plays ``games_per_pair`` games per round; first mover
        alternates by ``(i + j + round) % 2`` (arena.py:339-341). Per-game
        ELO updates, as the reference does (arena.py:347)."""
        rounds = rounds if rounds is not None else self.config.rounds
        n = len(self.players)
        if getattr(self.config, "merge_pairings", False):
            # merge_pairings supersedes batch_rounds: the canonical
            # (pairing, color-half) unit decomposition (same game counts
            # and ELO replay order as batch_rounds; same documented
            # color-split divergence) played as ONE device program for the
            # whole tournament instead of one per pairing —
            # run_tournament_sharded's single-shard form routes through
            # play_units_merged.
            return self.run_tournament_sharded(key, rounds=rounds)
        if getattr(self.config, "batch_rounds", False):
            # all rounds of a pairing in ONE batched device call —
            # ~rounds-x fewer dispatches, which dominates small evals
            # through the relay. Game count per pairing is EXACTLY
            # rounds * games_per_pair (play_pair needs an even batch, so
            # an odd total plays one filler game whose score is
            # discarded), and the per-game ELO updates are replayed in
            # the SAME round-interleaved (round, pairing, game) order as
            # the non-batched path below — ELO updates are
            # path-dependent, so ordering must match for the two modes
            # to agree. The one remaining difference is the documented
            # color split: exactly half/half per pairing instead of
            # alternating the first mover by round.
            per_pair: Dict[Tuple[int, int], List[float]] = {}
            total = rounds * self.config.games_per_pair
            for i in range(n):
                for j in range(i + 1, n):
                    if total == 0:
                        continue
                    key, match_key = jax.random.split(key)
                    scores = self.play_games(self.players[i],
                                             self.players[j], match_key,
                                             total + total % 2)
                    per_pair[(i, j)] = [float(s) for s in scores[:total]]
            self._replay_elo(per_pair, rounds)
            return self.elo.get_leaderboard()
        for round_num in range(rounds):
            for i in range(n):
                for j in range(i + 1, n):
                    if (i + j + round_num) % 2 == 0:
                        first, second = self.players[i], self.players[j]
                    else:
                        first, second = self.players[j], self.players[i]
                    key, match_key = jax.random.split(key)
                    scores = self.play_games(first, second, match_key,
                                             self.config.games_per_pair)
                    for s in scores:
                        self.elo.update_ratings(first.name, second.name,
                                                float(s))
        return self.elo.get_leaderboard()

    def _replay_elo(self, per_pair: Dict[Tuple[int, int], List[float]],
                    rounds: int) -> None:
        """Apply per-game ELO updates in the canonical round-interleaved
        (round, pairing, game) order — ELO updates are path-dependent, so
        every consumer of batched scores must replay them identically
        (shared by ``batch_rounds`` and the sharded tournament)."""
        g = self.config.games_per_pair
        for round_num in range(rounds):
            for (i, j), scores in per_pair.items():
                for s in scores[round_num * g:(round_num + 1) * g]:
                    self.elo.update_ratings(self.players[i].name,
                                            self.players[j].name, s)

    def _tournament_units(self, key: jax.Array, rounds: int):
        """Canonical (pairing, color-half) work units of a batched
        tournament: two single-color batches per pairing, with keys derived
        by the same canonical splits on every process. The unit list —
        order, game counts, keys — is a pure function of (players, config,
        key), NEVER of the shard layout, so any shard_count produces the
        same global game set."""
        n = len(self.players)
        total = rounds * self.config.games_per_pair
        units = []
        for i in range(n):
            for j in range(i + 1, n):
                key, match_key = jax.random.split(key)
                nb = (total + 1) // 2  # A-black half (odd totals favor black
                nw = total // 2        # like the unsplit batch's kept games)
                if nb:
                    units.append((i, j, nb, nb,
                                  jax.random.fold_in(match_key, 0)))
                if nw:
                    units.append((i, j, nw, 0,
                                  jax.random.fold_in(match_key, 1)))
        return units

    def run_tournament_sharded(self, key: jax.Array, shard_index: int = 0,
                               shard_count: int = 1, gather=None,
                               rounds: Optional[int] = None) -> List[Dict]:
        """Tournament with the work SHARDED over processes (VERDICT r3
        item 3): this shard plays only the (pairing, color-half) units with
        ``unit_index % shard_count == shard_index``; ``gather`` merges the
        per-unit score rows across shards (``parallel.multihost.
        gather_unit_scores`` — an allgather picking each unit's owner row);
        then EVERY shard replays the per-game ELO updates in the canonical
        order, so all leaderboards agree bit-exactly. At P processes the
        eval phase does ~1/P of the search work per process instead of
        duplicating the full arena everywhere.

        ``shard_count=1`` (and gather=None) is the single-process form —
        same decomposition, no communication. Game counts per pairing match
        ``run_tournament``'s ``batch_rounds`` path exactly; the units being
        single-color batches (``play_pair black_games``) rather than one
        half/half batch is the same documented color-split divergence.
        """
        rounds = rounds if rounds is not None else self.config.rounds
        units = self._tournament_units(key, rounds)
        self.units_played: List[int] = []
        if not units:
            return self.elo.get_leaderboard()
        max_g = max(u[2] for u in units)
        scores = np.zeros((len(units), max_g), np.float32)
        mine = [(u_idx, u) for u_idx, u in enumerate(units)
                if u_idx % shard_count == shard_index]
        self.units_played = [u_idx for u_idx, _ in mine]
        if getattr(self.config, "merge_pairings", False) and mine:
            # ALL of this shard's units in ONE compiled program, sharing
            # each half-ply's searches across pairings by searcher model
            # (_play_units_parts — the PERF.md r5 merged-gate lever). The
            # unit decomposition, per-unit keys, and score layout are
            # UNCHANGED, so the ELO replay below and the shard-count
            # invariance are untouched; per-unit results match the
            # play_games path (exactly for random players / deterministic
            # play — arena searches are key-free).
            merged_scores = self.play_units_merged([u for _, u in mine])
            for (u_idx, (i, j, ng, bg, _)), s in zip(mine, merged_scores):
                scores[u_idx, :ng] = s
        else:
            for u_idx, (i, j, ng, bg, ukey) in mine:
                s = self.play_games(self.players[i], self.players[j], ukey,
                                    ng, black_games=bg)
                scores[u_idx, :ng] = s
        if gather is not None:
            owners = np.arange(len(units)) % shard_count
            scores = gather(scores, owners)
        per_pair: Dict[Tuple[int, int], List[float]] = {}
        for u_idx, (i, j, ng, bg, _) in enumerate(units):
            per_pair.setdefault((i, j), []).extend(
                float(x) for x in scores[u_idx, :ng])
        self._replay_elo(per_pair, rounds)
        return self.elo.get_leaderboard()

    def save_results(self, filepath: str) -> None:
        """Persist ELO state (arena.py:401-409)."""
        self.elo.save_ratings(filepath)
