"""Batched PUCT MCTS: the search driver.

Replaces ``MCTS.search`` / ``get_action_probs``
(/root/reference/src/mcts/mcts.py:322-694). Architectural inversion for TPU:
the reference batches *leaves within one game* (collect ``batch_size`` tree
descents with virtual loss, one NN forward per round, mcts.py:348-392); here
the batch axis is *games* — every simulation round selects one leaf in each
of B games, evaluates all B leaves as a single NN forward on the MXU, and
expands/backs up with batched array ops. The whole search is one XLA
program: ``lax.fori_loop`` over simulations, nothing leaves the chip.

Performance shape (measured on TPU v5e, B=1024, 400 sims): the cost driver
is the number of *loop iterations containing dynamic-index ops*, so the
per-simulation select and backup walks are **statically unrolled** over
``max_depth`` levels (one row gather + one stats slice per level) instead of
``lax.while_loop``s — the v1 while-loop implementation spent ~13.7 ms per
simulation round on tree ops; this layout brings a round down to the NN
forward plus ~tens of µs. A simulation that is still mid-descent after
``max_depth`` levels is evaluated at the node it reached (mctx-style depth
truncation) — its value is backed up but no node is expanded.

Root Dirichlet noise and the temperature schedule are implemented here (the
reference only declared them in config — SURVEY.md §2.4).

Value/perspective convention (resolving the reference's documented
inconsistency between absolute and player-to-move terminal values,
mcts.py:569-575 vs self_play.py:117-126): every evaluated value is taken
from the perspective of the player to move at the evaluated state; backup
flips the sign per path level only when that level's player differs — which,
because the env auto-passes, is *not* every ply.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MCTSConfig
from ..env import bitboard as env
from ..models import resnet
from ..ops import random as rand_ops
from . import tree as tree_lib

NUM_ACTIONS = env.NUM_ACTIONS
A = NUM_ACTIONS


class SearchResult(NamedTuple):
    """Outcome of one batched search."""

    visit_counts: jax.Array  # [B, A] root child visit counts
    action_probs: jax.Array  # [B, A] normalized visit distribution (tau=1)
    root_value: jax.Array  # [B] mean root value (root player POV)
    tree: tree_lib.Tree  # final packed trees (for inspection/tests)


class ExactResult(NamedTuple):
    """Outcome of an exact endgame solve on the host play path
    (``MCTSConfig.exact_endgame_empties``; env/endgame.py). Mirrors the
    ``SearchResult`` fields consumers read (visit_counts / action_probs /
    root_value / chosen_action) so it can stand in for either search
    algorithm's result, plus the solver's native outputs."""

    visit_counts: jax.Array  # [1, A] one-hot at the optimal move
    action_probs: jax.Array  # [1, A] one-hot at the optimal move
    root_value: jax.Array  # [1] game-theoretic value: sign(disc_diff)
    chosen_action: jax.Array  # [1] the optimal move
    disc_diff: int  # exact final disc differential (mover - opponent)
    nodes: int  # solver nodes visited


def add_dirichlet_noise(prior: jax.Array, legal: jax.Array, key: jax.Array,
                        alpha: float, epsilon: float) -> jax.Array:
    """Mix root prior with Dirichlet noise over the legal actions
    (AlphaZero standard; declared-but-unused in the reference,
    src/config.py:25-26).

    The draw uses the collective-free fixed-trial gamma sampler
    (``ops.random``) instead of ``jax.random.dirichlet``, whose rejection
    while_loop would put a per-round ``all-reduce`` into every sharded
    self-play program (the predicate reduces over the batch under GSPMD)."""
    noise = rand_ops.dirichlet_noise(key, alpha, legal, dtype=prior.dtype)
    mixed = (1.0 - epsilon) * prior + epsilon * noise
    mixed = jnp.where(legal, mixed, 0.0)
    return mixed / jnp.maximum(mixed.sum(-1, keepdims=True), 1e-12)


def _evaluate(net, variables, states: env.EnvState, compat: bool
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batch NN eval of env states -> (prior [B,A], value [B], legal [B,A]).

    Terminal states get their exact game outcome instead of the NN value —
    from the player-to-move perspective (fixing the reference's
    absolute-perspective terminal values, mcts.py:569-575)."""
    planes = env.canonical_planes(states, compat=compat)
    logits, value = resnet.apply_eval(net, variables, planes)
    legal = env.legal_action_mask(states, compat=compat)
    prior = resnet.masked_policy(logits, legal)
    term_val = env.terminal_value(states, states.to_move)
    value = jnp.where(states.done, term_val, value)
    return prior, value, legal


def _stage_bounds(num_simulations: int, num_stages: int) -> Tuple[int, ...]:
    """Simulation-count boundaries for staged tree-capacity growth.

    Every per-round full-pass cost (gather relayouts, the backup scatter,
    the loop-carry copy) scales with the tree arrays' *bytes*, i.e. with
    the node capacity (measured — PERF.md). Running the first simulations
    in a small tree and growing it between stages cuts the average
    capacity a round pays for to ``~(1 + 1/num_stages)/2`` of the final
    capacity. Simulation semantics are IDENTICAL to the unstaged search:
    slot allocation is global (sim i writes slot i+1) and a stage's
    capacity always covers every slot it can write.
    """
    if num_stages <= 1 or num_simulations < 2 * num_stages:
        return (num_simulations,)
    bounds = []
    for s in range(1, num_stages + 1):
        b = (num_simulations * s) // num_stages
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return tuple(bounds)


def expand_and_backup(net, variables, trees: tree_lib.Tree, pn: jax.Array,
                      pa: jax.Array, pt: jax.Array, leaves: jax.Array,
                      leaf_acts: jax.Array, eval_rows: jax.Array, slot0,
                      root_to_move: jax.Array, compat: bool
                      ) -> tree_lib.Tree:
    """Selection-agnostic tail of a simulation round: evaluate the selected
    leaves, expand them into contiguous slots, and back the values up — the
    shared machinery of the PUCT (``run_search``) and Gumbel
    (``gumbel.run_gumbel_search``) drivers.

    ``pn``/``pa``/``pt`` are the ``[B, L*levels]`` lane-major path arrays
    (node / action / to-move per visited level, ``node < 0`` on padding);
    ``leaves``/``leaf_acts`` are ``[B, L]`` (``leaf_acts < 0`` marks a lane
    that terminates without expansion); ``eval_rows`` is ``[B, L, K]`` — the
    packed row of each lane's evaluation target (the leaf's parent row; the
    leaf state is produced here by stepping it).
    """
    batch, L = leaves.shape
    levels = pn.shape[1] // L

    # ---------------- evaluate all L*B leaves at once ---------------
    base_state = tree_lib.unpack_state(
        eval_rows.reshape(batch * L, -1)[:, A:])
    do_expand = (leaf_acts >= 0).reshape(batch * L)
    stepped, _ = env.step(
        base_state, jnp.maximum(leaf_acts.reshape(batch * L), 0),
        compat=compat)
    eval_state = jax.tree_util.tree_map(
        lambda s, t: jnp.where(do_expand, t, s), base_state, stepped)
    prior_c, value_c, legal_c = _evaluate(net, variables, eval_state,
                                          compat)

    # ------------- expand: L contiguous slots, ONE DUS --------------
    trees = tree_lib.write_children_rows(
        trees, slot0,
        tree_lib.make_row(eval_state, prior_c, legal_c, value_c
                          ).reshape(batch, L, -1))

    # ------- backup + child link: one fused whole-round scatter -----
    eval_tomove = eval_state.to_move.reshape(batch, L)  # [B, L]
    value_bl = value_c.reshape(batch, L)
    # per path entry: sign vs the to_move of its descent's evaluated
    # state (entry j belongs to descent j // levels)
    et_expand = jnp.repeat(eval_tomove, levels, axis=1)  # [B, L*levels]
    v_expand = jnp.repeat(value_bl, levels, axis=1)
    sign = jnp.where(pt == et_expand.astype(jnp.float32), 1.0, -1.0)

    # in-round duplicate (leaf, action) selections: evaluate + back up
    # again, link only the first (an edge's packed child slot must be
    # added exactly once)
    same = ((leaves[:, :, None] == leaves[:, None, :])
            & (leaf_acts[:, :, None] == leaf_acts[:, None, :]))
    earlier = jnp.tril(jnp.ones((L, L), jnp.bool_), k=-1)[None]
    is_dup = (same & earlier).any(-1)
    do_link = (leaf_acts >= 0) & ~is_dup
    slots = slot0 + jnp.arange(L, dtype=jnp.int32)[None]  # [1, L]

    trees = tree_lib.backup_and_link(
        trees, pn, pa, sign * v_expand,
        leaves, jnp.maximum(leaf_acts, 0),
        jnp.broadcast_to(slots, leaves.shape), do_link)
    rsign = jnp.where(eval_tomove == root_to_move[:, None], 1.0, -1.0)
    return trees._replace(
        root_visit=trees.root_visit + L,
        root_vsum=trees.root_vsum + (rsign * value_bl).sum(-1),
    )


def _grow_tree(trees: tree_lib.Tree, capacity: int) -> tree_lib.Tree:
    """Zero-pad the node axis to ``capacity`` (slots above are unwritten)."""
    batch, old, k = trees.rows.shape
    pad = capacity - old
    return trees._replace(
        rows=jnp.pad(trees.rows, ((0, 0), (0, pad), (0, 0))),
        stats=jnp.pad(trees.stats, ((0, 0), (0, pad * tree_lib.STRIDE))),
    )


@functools.partial(
    jax.jit,
    static_argnames=("net", "num_simulations", "max_depth", "compat",
                     "add_noise", "num_stages", "leaf_batch",
                     "warm_discount"),
)
def run_search(net, variables: Dict[str, Any], root_states: env.EnvState,
               key: jax.Array, *, num_simulations: int, c_puct: float,
               dirichlet_alpha: float, dirichlet_epsilon: float,
               max_depth: int = 24, compat: bool = False,
               add_noise: bool = True, num_stages: int = 6,
               leaf_batch: int = 1,
               warm_root: Optional[Tuple[jax.Array, jax.Array]] = None,
               warm_discount: float = 1.0) -> SearchResult:
    """Run batched MCTS from ``root_states`` (leading batch axis B).

    ``leaf_batch`` (``MCTSConfig.batch_size``) is the number of leaves each
    game selects/evaluates/expands per simulation round. The reference's
    ``batch_size`` collected leaves within ONE game with virtual loss
    (mcts.py:348-392,416); here every game contributes ``leaf_batch``
    leaves per round, so a round's NN forward is ``leaf_batch*B`` states
    (bigger MXU batch) while the per-round full-pass tree costs — the
    loop-carry copy, the gather-lowering relayouts, the backup scatter —
    are paid once per round instead of once per simulation. Descents within
    a round diversify by **root virtual loss** (each in-round descent adds
    one pending root visit counted as a loss); descents that nevertheless
    land on the same (leaf, action) evaluate/back up that leaf again but
    link it only once (exactly the reference's duplicate-leaf behavior
    under virtual loss). ``num_simulations`` must divide by ``leaf_batch``.

    ``warm_root``: optional ``(visits [B, A], vsum [B, A])`` pair seeding
    the root's edge statistics from the previous move's search
    (``tree.root_child_warm_stats`` — 1-level tree reuse,
    ``MCTSConfig.tree_reuse="root"``). Warm edges carry their Q estimates
    into selection but have no child nodes (first selection re-expands
    them). The returned ``visit_counts``/``action_probs`` count ONLY this
    search's ``num_simulations`` fresh visits (warm visits are subtracted),
    so training targets and temperature sampling are uncontaminated by the
    previous move's budget; ``root_value`` blends warm and fresh evidence.

    ``warm_discount`` < 1 shrinks the warm evidence's WEIGHT while
    preserving its per-edge Q (``tree.discount_warm``). In PUCT the warm
    visit counts both suppress exploration of warm edges and give stale Q
    ~warm-visits of inertia against fresh backups — measured at PUCT-100
    to make undiscounted reuse WEAKER than a cold search (-59 ELO at
    equal sims) even though the carry holds ~73% of the budget
    (refbench/reuse_strength.json); a small discount keeps the evidence
    and returns the allocation to near-cold behavior.
    """
    batch = root_states.to_move.shape[0]
    L = leaf_batch
    if L < 1 or num_simulations % L != 0:
        raise ValueError(
            f"num_simulations={num_simulations} must be a positive multiple "
            f"of leaf_batch={L}")
    num_rounds = num_simulations // L
    c = jnp.float32(c_puct)
    # a path cannot be longer than the expansions that built it, nor than
    # the number of stones the board can still take
    levels_cap = max(1, min(max_depth, num_simulations, 60))

    # --- root evaluation + install -------------------------------------
    prior, root_raw_value, legal = _evaluate(net, variables, root_states,
                                             compat)
    if add_noise:
        prior = add_dirichlet_noise(prior, legal, key, dirichlet_alpha,
                                    dirichlet_epsilon)

    bounds = _stage_bounds(num_rounds, num_stages)
    trees = tree_lib.init_root(tree_lib.make_tree(batch, bounds[0] * L + 1),
                               root_states, prior, legal, root_raw_value)
    if warm_root is not None:
        warm_v = jnp.where(legal, jnp.maximum(
            warm_root[0].astype(jnp.float32), 0.0), 0.0)
        warm_s = warm_root[1].astype(jnp.float32)
        if warm_discount != 1.0:
            warm_v, warm_s = tree_lib.discount_warm(warm_v, warm_s,
                                                    warm_discount)
        trees = tree_lib.seed_root_stats(trees, warm_v, warm_s, legal)
    root_to_move = root_states.to_move
    root_row = trees.rows[:, 0, :]
    root_p, root_lg = tree_lib.decode_prior_legal(root_row)
    root_done = root_row[:, tree_lib.S_DONE] > 0.5
    root_tomove = root_row[:, tree_lib.S_TO_MOVE]
    S = tree_lib.STRIDE

    def make_sim_round(levels):
      # Depth-staged select: before round r the tree holds r rounds of
      # expansions, every one of which attaches to a pre-existing node, so
      # no node sits deeper than level r and a round-r descent needs at
      # most r+1 select iterations. Each capacity stage therefore unrolls
      # only ``min(levels_cap, last_round_of_stage + 1)`` levels — the
      # iterations dropped were provably dead (every lane already
      # finished), so results are bit-identical while early stages (and
      # entire low-simulation searches) skip most of the per-level
      # dynamic-index costs.
      def sim_round(r, trees):
        # root edge stats: a STATIC slice (node 0) — no gather; constant
        # within the round, adjusted per descent by the in-round virtual
        # visits ``root_extra``
        root_srow = trees.stats[:, :S]
        root_packed = root_srow[:, tree_lib.VISITS_OFF:tree_lib.VISITS_OFF + A]
        root_visits, root_child = tree_lib.unpack_visits_child(root_packed)
        root_vsum = root_srow[:, tree_lib.VSUM_OFF:tree_lib.VSUM_OFF + A]
        root_extra = jnp.zeros((batch, A), jnp.float32)

        # ---- select, root phase: sequential in L, pure VPU math --------
        # In-round virtual loss only ever applies at the ROOT (the root is
        # a static slice, its stats frozen for the round), so the only
        # lane-to-lane dependency is the root pick. Resolve the L root
        # actions sequentially — cheap [B, A] arithmetic, no gathers —
        # then run all L descents below the root in lockstep as one
        # [B, L]-lane program: each deeper level costs ONE batched gather
        # of L rows per game instead of L separate gather passes
        # (per-game multi-row gathers are sub-linear in L on TPU; the
        # L-sequential form made flagship leaf_batch=4 SLOWER than
        # leaf_batch=1, roofline_tpu.json).
        a0s, child0s = [], []
        for l in range(L):
            # virtual loss: pending in-round root visits count as visits
            # that returned a loss
            visits = root_visits + root_extra
            vsum = root_vsum - root_extra
            q = jnp.where(visits > 0, vsum / jnp.maximum(visits, 1.0), 0.0)
            parent_visit = visits.sum(-1, keepdims=True) + 1.0
            score = q + c * root_p * jnp.sqrt(parent_visit) / (1.0 + visits)
            score = jnp.where(root_lg, score, -jnp.inf)
            a = jnp.argmax(score, -1).astype(jnp.int32)
            # column pick via one-hot multiply-sum: a take_along_axis here
            # is a dynamic-index op costing ~27 us/level on TPU (profiled);
            # the one-hot form is pure VPU work
            onehot_a = jax.nn.one_hot(a, A, dtype=jnp.float32)
            root_extra = root_extra + jnp.where(~root_done[:, None],
                                                onehot_a, 0.0)
            a0s.append(a)
            child0s.append((root_child * onehot_a).sum(-1).astype(jnp.int32))
        a0 = jnp.stack(a0s, -1)          # [B, L]
        child0 = jnp.stack(child0s, -1)  # [B, L]

        # level-0 lane state ([B, L] throughout)
        can0 = jnp.broadcast_to(~root_done[:, None], a0.shape)
        found = can0 & (child0 == 0)
        finishing = found | ~can0  # ~can0 == done root == hit_terminal
        path_nodes = [jnp.where(can0, 0, -1).astype(jnp.int32)]
        path_actions = [jnp.where(can0, a0, 0)]
        path_tomove = [jnp.broadcast_to(root_tomove[:, None], a0.shape)]
        leaf = jnp.zeros_like(a0)
        leaf_action = jnp.where(found, a0, -1)
        eval_row = jnp.broadcast_to(root_row[:, None, :],
                                    (batch, L, root_row.shape[-1]))
        alive = ~finishing
        node = jnp.where(alive, child0, 0)

        # ---- select, deep phase: all L lanes in lockstep ---------------
        for level in range(1, levels):
            row, srow = tree_lib.gather_node(trees, node)  # [B, L, K/S]
            p, lg = tree_lib.decode_prior_legal(row)
            done_n = row[..., tree_lib.S_DONE] > 0.5
            tomove_n = row[..., tree_lib.S_TO_MOVE]
            packed = srow[..., tree_lib.VISITS_OFF:tree_lib.VISITS_OFF + A]
            visits, child = tree_lib.unpack_visits_child(packed)
            vsum = srow[..., tree_lib.VSUM_OFF:tree_lib.VSUM_OFF + A]

            q = jnp.where(visits > 0, vsum / jnp.maximum(visits, 1.0), 0.0)
            parent_visit = visits.sum(-1, keepdims=True) + 1.0
            score = q + c * p * jnp.sqrt(parent_visit) / (1.0 + visits)
            score = jnp.where(lg, score, -jnp.inf)
            a = jnp.argmax(score, -1).astype(jnp.int32)
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

        # depth-truncated lanes evaluate the node they reached (no
        # expansion)
        trow, _ = tree_lib.gather_node(trees, node)
        eval_row = jnp.where(alive[..., None], trow, eval_row)

        # [B, L, levels] -> [B, L*levels], lane-major (descent l's levels
        # contiguous — the ordering the backup sign/repeat logic assumes)
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
        # last round of this stage is end-1 -> needs at most `end` levels
        trees = jax.lax.fori_loop(
            start, end, make_sim_round(max(1, min(levels_cap, end))), trees)
        start = end

    visit_counts = tree_lib.root_visit_counts(trees)
    if warm_root is not None:
        # report FRESH visits only: targets/sampling must reflect this
        # search's budget, not the carried-over warm counts
        visit_counts = visit_counts - warm_v.astype(jnp.int32)
    total = jnp.maximum(visit_counts.sum(axis=-1, keepdims=True), 1)
    action_probs = visit_counts.astype(jnp.float32) / total
    return SearchResult(visit_counts=visit_counts, action_probs=action_probs,
                        root_value=tree_lib.root_value(trees), tree=trees)


def probs_with_temperature(visit_counts: jax.Array, temperature: jax.Array
                           ) -> jax.Array:
    """Visit counts -> action distribution at the given temperature.

    Matches ``MCTS.get_action_probs`` semantics (mcts.py:642-694):
    ``tau <= ~0`` plays the argmax deterministically, otherwise
    ``p(a) ∝ N(a)^(1/tau)``. Computed in log space for stability.
    """
    counts = visit_counts.astype(jnp.float32)
    greedy = jax.nn.one_hot(jnp.argmax(counts, axis=-1), counts.shape[-1],
                            dtype=jnp.float32)
    safe_tau = jnp.maximum(temperature, 1e-3)
    logits = jnp.where(counts > 0, jnp.log(jnp.maximum(counts, 1e-12)),
                       -jnp.inf)
    scaled = logits / safe_tau
    scaled = scaled - jax.lax.stop_gradient(
        scaled.max(axis=-1, keepdims=True))
    powed = jnp.exp(scaled)
    powed = jnp.where(counts > 0, powed, 0.0)
    soft = powed / jnp.maximum(powed.sum(axis=-1, keepdims=True), 1e-12)
    no_visits = counts.sum(axis=-1, keepdims=True) == 0
    soft = jnp.where(no_visits, greedy, soft)
    return jnp.where(temperature < 1e-3, greedy, soft)


def sample_actions(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Sample an action per row from the visit distribution
    (mcts.py:679-684)."""
    logits = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-12)),
                       -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


class MCTS:
    """Object-style wrapper matching the reference's ``MCTS`` surface
    (mcts.py:191-719: ``search``/``get_action_probs``) for single- or
    batched-game use. Stateless between calls: the reference's
    ``update_with_move`` wipes the subtree anyway (mcts.py:696-719 — tree
    reuse is a no-op there, SURVEY.md appendix), so a fresh tree per move is
    behaviorally identical.
    """

    def __init__(self, net, variables, config: MCTSConfig,
                 compat: bool = False, transposition_table=None):
        self.net = net
        self._variables = variables
        self.config = config
        self.compat = compat
        # host transposition cache (mcts.transposition.TranspositionTable)
        # consulted for deterministic (noise-free) single-game queries —
        # the living version of the reference's dead TT (mcts.py:237-320)
        if (transposition_table is not None and compat
                and transposition_table.use_symmetry):
            # compat rules are NOT dihedral-equivariant (the edge-wrap /
            # west-mask quirks single out east/west — symmetry.py): a
            # symmetry hit could return counts on moves illegal in the
            # query orientation. Downgrade a fresh table to exact-position
            # keys; refuse one that already holds symmetry-keyed entries.
            if len(transposition_table):
                raise ValueError(
                    "compat-mode MCTS cannot reuse a symmetry-keyed "
                    "transposition table with existing entries")
            transposition_table.use_symmetry = False
        self.transposition_table = transposition_table
        # exact endgame solving (env/endgame.py, native alpha-beta) for
        # batch-1 host queries at <= exact_endgame_empties empty squares —
        # beyond-reference extension: converts won endgames perfectly
        self.endgame_solver = None
        if config.exact_endgame_empties > 0:
            from ..env import endgame as endgame_lib
            self.endgame_solver = endgame_lib.EndgameSolver(compat=compat)

    @property
    def variables(self):
        return self._variables

    @variables.setter
    def variables(self, new_variables):
        # cached searches are a function of the weights: swapping the model
        # (the pipeline's promotion pattern) must invalidate the table
        if self.transposition_table is not None and new_variables is not \
                self._variables:
            self.transposition_table.clear()
        self._variables = new_variables

    def search_batch(self, root_states: env.EnvState, key: jax.Array,
                     add_noise: bool = True):
        """Run the configured search algorithm. Returns a ``SearchResult``
        (``algorithm="puct"``) or a ``gumbel.GumbelResult``
        (``algorithm="gumbel"`` — ``add_noise=False`` maps to a
        deterministic ``gumbel_scale=0`` search)."""
        if self.config.algorithm == "gumbel":
            from . import gumbel as gumbel_lib
            return gumbel_lib.run_gumbel_search(
                self.net, self.variables, root_states, key,
                num_simulations=self.config.num_simulations,
                max_considered_actions=self.config.max_considered_actions,
                c_visit=self.config.c_visit,
                c_scale=self.config.c_scale,
                gumbel_scale=1.0 if add_noise else 0.0,
                max_depth=self.config.max_depth,
                compat=self.compat,
                num_stages=self.config.num_stages,
                leaf_batch=self.config.batch_size,
            )
        return run_search(
            self.net, self.variables, root_states, key,
            num_simulations=self.config.num_simulations,
            c_puct=self.config.c_puct,
            dirichlet_alpha=self.config.dirichlet_alpha,
            dirichlet_epsilon=self.config.dirichlet_epsilon,
            max_depth=self.config.max_depth,
            compat=self.compat,
            add_noise=add_noise,
            num_stages=self.config.num_stages,
            leaf_batch=self.config.batch_size,
        )

    def get_action_probs(self, root_states: env.EnvState, key: jax.Array,
                         temperature: float = 1.0, add_noise: bool = True
                         ) -> Tuple[jax.Array, Any]:
        host = self._host_position(root_states, add_noise)
        exact = self._exact_endgame(host)
        if exact is not None:
            # exact play is deterministic: temperature and noise are
            # exploration devices for an approximate search, not for a
            # proven-optimal move
            return exact.action_probs, exact
        result = self._search_with_tt(root_states, key, add_noise, host)
        if self.config.algorithm == "gumbel":
            from . import gumbel as gumbel_lib
            return gumbel_lib.play_probs(result, temperature), result
        probs = probs_with_temperature(result.visit_counts,
                                       jnp.float32(temperature))
        return probs, result

    def _host_position(self, root_states: env.EnvState, add_noise: bool):
        """ONE device->host fetch of a batch-1 position, shared by the
        exact endgame solver and the transposition table (separate per-leaf
        fetches each pay a relay round trip on the remote TPU platform).
        Returns ``(black, white, to_move, passed, done)`` host ints, or
        None when nothing downstream wants the host view: batch != 1, or
        neither the solver nor a usable (noise-free) TT query."""
        want_solver = self.endgame_solver is not None
        want_tt = self.transposition_table is not None and not add_noise
        if (not (want_solver or want_tt)
                or root_states.to_move.shape != (1,)):
            return None

        from ..ops import u64 as u64_lib

        one = jax.device_get(
            jax.tree_util.tree_map(lambda x: x[0], root_states))
        return (u64_lib.to_int(one.black), u64_lib.to_int(one.white),
                int(one.to_move), int(one.passed), bool(one.done))

    def _exact_endgame(self, host) -> Optional[ExactResult]:
        """Solve the position exactly when configured and applicable:
        batch-1 host query, not finished, and at most
        ``exact_endgame_empties`` empty squares. Returns None otherwise
        (callers fall through to the tree search)."""
        if self.endgame_solver is None or host is None:
            return None

        import numpy as np

        from ..env import endgame as endgame_lib

        black, white, to_move, passed, done = host
        if done:
            return None
        if (endgame_lib.count_empties(black, white)
                > self.config.exact_endgame_empties):
            return None
        res = self.endgame_solver.solve(black, white, to_move,
                                        passed=passed)
        action = res.best_move if res.best_move >= 0 else env.PASS_ACTION
        one_hot = np.zeros((1, A), np.float32)
        one_hot[0, action] = 1.0
        return ExactResult(
            visit_counts=jnp.asarray(one_hot),
            action_probs=jnp.asarray(one_hot),
            root_value=jnp.asarray([float(np.sign(res.value))], jnp.float32),
            chosen_action=jnp.asarray([action], jnp.int32),
            disc_diff=res.value,
            nodes=res.nodes)

    def _search_with_tt(self, root_states: env.EnvState, key: jax.Array,
                        add_noise: bool, host=None):
        """Search, short-circuited through the transposition table when the
        query is cacheable: batch 1 (host match play) and noise-free (a
        Dirichlet-noised PUCT search is not a function of the position;
        neither is a gumbel_scale>0 Gumbel draw — ``add_noise=False`` maps
        to the deterministic ``gumbel_scale=0`` search, which is).
        ``host`` is ``_host_position``'s prefetched view (or None)."""
        tt = self.transposition_table
        if host is None:
            host = self._host_position(root_states, add_noise)
        cacheable = tt is not None and not add_noise and host is not None
        if not cacheable:
            return self.search_batch(root_states, key, add_noise=add_noise)

        import numpy as np

        black, white, to_move, _, _ = host
        if self.config.algorithm == "gumbel":
            from . import gumbel as gumbel_lib
            hit = tt.lookup_gumbel(black, white, to_move)
            if hit is not None:
                counts, value, probs, chosen = hit
                return gumbel_lib.GumbelResult(
                    visit_counts=jnp.asarray(counts, jnp.float32)[None],
                    action_probs=jnp.asarray(probs, jnp.float32)[None],
                    chosen_action=jnp.asarray([chosen], jnp.int32),
                    root_value=jnp.asarray([value], jnp.float32),
                    tree=None)
            result = self.search_batch(root_states, key, add_noise=False)
            tt.store(black, white, to_move,
                     np.asarray(result.visit_counts[0], np.float32),
                     float(np.asarray(result.root_value[0])),
                     action_probs=np.asarray(result.action_probs[0],
                                             np.float32),
                     chosen_action=int(np.asarray(result.chosen_action[0])))
            return result
        hit = tt.lookup(black, white, to_move)
        if hit is not None:
            counts, value = hit
            vc = jnp.asarray(counts, jnp.float32)[None]
            total = jnp.maximum(vc.sum(axis=-1, keepdims=True), 1.0)
            return SearchResult(visit_counts=vc, action_probs=vc / total,
                                root_value=jnp.asarray([value], jnp.float32),
                                tree=None)
        result = self.search_batch(root_states, key, add_noise=False)
        tt.store(black, white, to_move,
                 np.asarray(result.visit_counts[0], np.float32),
                 float(np.asarray(result.root_value[0])))
        return result
