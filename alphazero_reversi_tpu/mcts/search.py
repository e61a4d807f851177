"""Batched PUCT MCTS: the search driver.

Replaces ``MCTS.search`` / ``get_action_probs``
(/root/reference/src/mcts/mcts.py:322-694). Architectural inversion for TPU:
the reference batches *leaves within one game* (collect ``batch_size`` tree
descents with virtual loss, one NN forward per round, mcts.py:348-392); here
the batch axis is *games* — every simulation round selects one leaf in each
of B games, evaluates all B leaves as a single NN forward on the MXU, and
expands/backs-up with vmapped array ops. The whole search is one XLA
program: ``lax.fori_loop`` over simulations, no host round-trips.

Root Dirichlet noise and the temperature schedule are implemented here (the
reference only declared them in config — SURVEY.md §2.4).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MCTSConfig
from ..env import bitboard as env
from ..models import resnet
from . import tree as tree_lib

NUM_ACTIONS = env.NUM_ACTIONS


class SearchResult(NamedTuple):
    """Outcome of one batched search."""

    visit_counts: jax.Array  # [B, A] root child visit counts
    action_probs: jax.Array  # [B, A] normalized visit distribution (tau=1)
    root_value: jax.Array  # [B] mean root value (root player POV)
    tree: tree_lib.Tree  # [B, ...] final trees (for inspection/tests)


def add_dirichlet_noise(prior: jax.Array, legal: jax.Array, key: jax.Array,
                        alpha: float, epsilon: float) -> jax.Array:
    """Mix root prior with Dirichlet noise over the legal actions
    (AlphaZero standard; declared-but-unused in the reference,
    src/config.py:25-26)."""
    gamma = jax.random.gamma(key, alpha, prior.shape).astype(prior.dtype)
    gamma = jnp.where(legal, gamma, 0.0)
    noise = gamma / jnp.maximum(gamma.sum(), 1e-12)
    mixed = (1.0 - epsilon) * prior + epsilon * noise
    mixed = jnp.where(legal, mixed, 0.0)
    return mixed / jnp.maximum(mixed.sum(), 1e-12)


def _evaluate(net, variables, states: env.EnvState, compat: bool
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batch NN eval of env states -> (prior [B,A], value [B], legal [B,A]).

    Terminal states get their exact game outcome instead of the NN value —
    from the player-to-move perspective (fixing the reference's
    absolute-perspective terminal values, mcts.py:569-575; SURVEY.md §7d).
    """
    planes = jax.vmap(lambda s: env.canonical_planes(s, compat=compat))(states)
    logits, value = resnet.apply_eval(net, variables, planes)
    legal = jax.vmap(lambda s: env.legal_action_mask(s, compat=compat))(states)
    prior = resnet.masked_policy(logits, legal)
    term_val = jax.vmap(env.terminal_value)(states, states.to_move)
    value = jnp.where(states.done, term_val, value)
    return prior, value, legal


@functools.partial(
    jax.jit,
    static_argnames=("net", "num_simulations", "max_depth", "compat",
                     "add_noise"),
)
def run_search(net, variables: Dict[str, Any], root_states: env.EnvState,
               key: jax.Array, *, num_simulations: int, c_puct: float,
               dirichlet_alpha: float, dirichlet_epsilon: float,
               max_depth: int = 64, compat: bool = False,
               add_noise: bool = True) -> SearchResult:
    """Run batched MCTS from ``root_states`` (leading batch axis B)."""
    batch = root_states.to_move.shape[0]
    capacity = num_simulations + 1
    c_puct = jnp.float32(c_puct)

    # --- root evaluation + install -------------------------------------
    prior, _, legal = _evaluate(net, variables, root_states, compat)
    if add_noise:
        noise_keys = jax.random.split(key, batch)
        prior = jax.vmap(
            lambda p, l, k: add_dirichlet_noise(
                p, l, k, dirichlet_alpha, dirichlet_epsilon)
        )(prior, legal, noise_keys)

    trees = jax.vmap(lambda _: tree_lib.empty_tree(capacity))(
        jnp.arange(batch))
    trees = jax.vmap(tree_lib.init_root)(trees, root_states, prior, legal)

    # --- simulation rounds ---------------------------------------------
    def sim_round(_, trees):
        leaf, action = jax.vmap(
            lambda t: tree_lib.select_leaf(t, c_puct, max_depth))(trees)

        def child_of(t, leaf, action):
            leaf_state = jax.tree_util.tree_map(lambda x: x[leaf], t.state)
            stepped, _ = env.step(leaf_state, jnp.maximum(action, 0),
                                  compat=compat)
            # terminal leaf (action == -1): keep the leaf state; its eval is
            # discarded by expand_and_backup's terminal branch.
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(action < 0, a, b), leaf_state, stepped)

        child_states = jax.vmap(child_of)(trees, leaf, action)
        child_prior, child_value, child_legal = _evaluate(
            net, variables, child_states, compat)
        trees = jax.vmap(
            lambda t, l, a, cs, cp, cl, cv: tree_lib.expand_and_backup(
                t, l, a, cs, cp, cl, cv, max_depth)
        )(trees, leaf, action, child_states, child_prior, child_legal,
          child_value)
        return trees

    trees = jax.lax.fori_loop(0, num_simulations, sim_round, trees)

    visit_counts = jax.vmap(tree_lib.root_visit_counts)(trees)
    total = jnp.maximum(visit_counts.sum(axis=-1, keepdims=True), 1)
    action_probs = visit_counts.astype(jnp.float32) / total
    root_val = jax.vmap(tree_lib.root_value)(trees)
    return SearchResult(visit_counts=visit_counts, action_probs=action_probs,
                        root_value=root_val, tree=trees)


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
    # temperature may be a traced scalar -> branchless select
    safe_tau = jnp.maximum(temperature, 1e-3)
    logits = jnp.where(counts > 0, jnp.log(jnp.maximum(counts, 1e-12)), -jnp.inf)
    scaled = logits / safe_tau
    scaled = scaled - jax.lax.stop_gradient(scaled.max(axis=-1, keepdims=True))
    powed = jnp.exp(scaled)
    powed = jnp.where(counts > 0, powed, 0.0)
    soft = powed / jnp.maximum(powed.sum(axis=-1, keepdims=True), 1e-12)
    no_visits = counts.sum(axis=-1, keepdims=True) == 0
    soft = jnp.where(no_visits, greedy, soft)
    return jnp.where(temperature < 1e-3, greedy, soft)


def sample_actions(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Sample an action per row from the visit distribution
    (mcts.py:679-684)."""
    logits = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-12)), -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


class MCTS:
    """Object-style wrapper matching the reference's ``MCTS`` surface
    (mcts.py:191-. ``search``/``get_action_probs``) for single- or batched-
    game use. Stateless between calls: the reference's ``update_with_move``
    wipes the subtree anyway (mcts.py:696-719 — tree reuse is a no-op there,
    SURVEY.md appendix), so a fresh tree per move is behaviorally identical.
    """

    def __init__(self, net, variables, config: MCTSConfig,
                 compat: bool = False):
        self.net = net
        self.variables = variables
        self.config = config
        self.compat = compat

    def search_batch(self, root_states: env.EnvState, key: jax.Array,
                     add_noise: bool = True) -> SearchResult:
        return run_search(
            self.net, self.variables, root_states, key,
            num_simulations=self.config.num_simulations,
            c_puct=self.config.c_puct,
            dirichlet_alpha=self.config.dirichlet_alpha,
            dirichlet_epsilon=self.config.dirichlet_epsilon,
            max_depth=self.config.max_depth,
            compat=self.compat,
            add_noise=add_noise,
        )

    def get_action_probs(self, root_states: env.EnvState, key: jax.Array,
                         temperature: float = 1.0, add_noise: bool = True
                         ) -> Tuple[jax.Array, SearchResult]:
        result = self.search_batch(root_states, key, add_noise=add_noise)
        probs = probs_with_temperature(result.visit_counts,
                                       jnp.float32(temperature))
        return probs, result
