"""Fixed-shape array tree for batched MCTS on TPU.

Replaces the reference's Python pointer tree (``MCTSNode``,
/root/reference/src/mcts/mcts.py:33-188) with preallocated arrays of node
statistics — the mctx-style structure that XLA can compile: no dynamic
allocation, no Python objects, every op an indexed array update. One tree of
capacity ``N = num_simulations + 1`` per game; every function in this module
operates on a *single* game's tree and is ``vmap``-ed over the game batch by
the search driver (``search.py``).

Value/perspective convention (this resolves the reference's documented
inconsistency between absolute and player-to-move values, mcts.py:569-575 vs
self_play.py:117-126 — SURVEY.md §7 hard part (d)): ``value_sum[i]`` always
accumulates values **from the perspective of the player to move at node i**.
PUCT and backup flip signs only when the child/ancestor's player-to-move
differs — which, because the env auto-passes, is *not* every ply.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..env import bitboard as env
from ..env.bitboard import EnvState

NUM_ACTIONS = env.NUM_ACTIONS
NO_PARENT = jnp.int32(-1)
UNVISITED = jnp.int32(-1)


class Tree(NamedTuple):
    """Per-game search tree of capacity N (leading axis of every field)."""

    visit: jax.Array  # [N] i32 — visit count per node
    value_sum: jax.Array  # [N] f32 — sum of backed-up values (node-to-move POV)
    prior: jax.Array  # [N, A] f32 — children priors P(a|s)
    children: jax.Array  # [N, A] i32 — child node index or UNVISITED
    parent: jax.Array  # [N] i32 — parent node index, NO_PARENT for root
    action_from_parent: jax.Array  # [N] i32
    legal: jax.Array  # [N, A] bool — legal action mask at the node
    expanded: jax.Array  # [N] bool — node has been evaluated (prior valid)
    state: EnvState  # env state per node, leaves shaped [N, ...]
    count: jax.Array  # scalar i32 — nodes in use


def empty_tree(capacity: int) -> Tree:
    zero_state = jax.tree_util.tree_map(
        lambda x: jnp.zeros((capacity,) + x.shape, x.dtype),
        env.initial_state(),
    )
    return Tree(
        visit=jnp.zeros(capacity, jnp.int32),
        value_sum=jnp.zeros(capacity, jnp.float32),
        prior=jnp.zeros((capacity, NUM_ACTIONS), jnp.float32),
        children=jnp.full((capacity, NUM_ACTIONS), UNVISITED, jnp.int32),
        parent=jnp.full(capacity, NO_PARENT, jnp.int32),
        action_from_parent=jnp.full(capacity, -1, jnp.int32),
        legal=jnp.zeros((capacity, NUM_ACTIONS), jnp.bool_),
        expanded=jnp.zeros(capacity, jnp.bool_),
        state=zero_state,
        count=jnp.int32(0),
    )


def _set_index(tree_arrays, idx, values):
    return jax.tree_util.tree_map(
        lambda arr, v: arr.at[idx].set(v), tree_arrays, values)


def init_root(tree: Tree, root_state: EnvState, prior: jax.Array,
              legal: jax.Array) -> Tree:
    """Install the root (node 0) with its evaluated prior."""
    return tree._replace(
        prior=tree.prior.at[0].set(prior),
        legal=tree.legal.at[0].set(legal),
        expanded=tree.expanded.at[0].set(True),
        state=_set_index(tree.state, 0, root_state),
        parent=tree.parent.at[0].set(NO_PARENT),
        count=jnp.int32(1),
    )


def puct_scores(tree: Tree, node: jax.Array, c_puct: jax.Array) -> jax.Array:
    """PUCT score per action at ``node`` (reference formula mcts.py:102-113:
    ``Q + c_puct * P * sqrt(parent_visits) / (1 + child_visits)``), with
    illegal actions at -inf and Q sign-corrected to the node's perspective."""
    child = tree.children[node]  # [A]
    has_child = child != UNVISITED
    safe_child = jnp.maximum(child, 0)
    child_visit = jnp.where(has_child, tree.visit[safe_child], 0)
    child_sum = jnp.where(has_child, tree.value_sum[safe_child], 0.0)
    child_q = jnp.where(child_visit > 0, child_sum / jnp.maximum(child_visit, 1), 0.0)
    same_player = tree.state.to_move[safe_child] == tree.state.to_move[node]
    q = jnp.where(has_child & same_player, child_q, -child_q)
    q = jnp.where(has_child, q, 0.0)  # FPU: unvisited children Q = 0
    sqrt_parent = jnp.sqrt(jnp.maximum(tree.visit[node], 1).astype(jnp.float32))
    u = c_puct * tree.prior[node] * sqrt_parent / (1.0 + child_visit)
    score = q + u
    return jnp.where(tree.legal[node], score, -jnp.inf)


def select_leaf(tree: Tree, c_puct: jax.Array, max_depth: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Descend from the root by PUCT until an unexpanded edge or terminal.

    Returns ``(node, action)``; ``action == -1`` means the node itself is a
    terminal leaf (its stored value is backed up without expansion).
    Replaces ``MCTS._traverse`` (mcts.py:409-444) — but as a bounded
    ``lax.while_loop`` instead of Python recursion over dict children.
    """

    def cond(carry):
        _, _, depth, finished = carry
        return (~finished) & (depth < max_depth)

    def body(carry):
        node, _, depth, _ = carry
        terminal = tree.state.done[node]
        scores = puct_scores(tree, node, c_puct)
        action = jnp.argmax(scores).astype(jnp.int32)
        child = tree.children[node, action]
        at_leaf_edge = child == UNVISITED
        finished = terminal | at_leaf_edge
        out_action = jnp.where(terminal, jnp.int32(-1), action)
        next_node = jnp.where(finished, node, child)
        return next_node, out_action, depth + 1, finished

    node, action, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(-1), jnp.int32(0), jnp.bool_(False)))
    return node, action


def backup(tree: Tree, leaf: jax.Array, value: jax.Array, max_depth: int
           ) -> Tree:
    """Propagate ``value`` (leaf's player-to-move POV) up to the root.

    Replaces ``MCTS._backpropagate_path`` (mcts.py:625-640); the sign flips
    per *player change*, not per ply, which handles auto-pass chains.
    """
    leaf_player = tree.state.to_move[leaf]

    def cond(carry):
        node, _, depth = carry
        return (node != NO_PARENT) & (depth < max_depth + 1)

    def body(carry):
        node, (visit, value_sum), depth = carry
        sign = jnp.where(tree.state.to_move[node] == leaf_player, 1.0, -1.0)
        visit = visit.at[node].add(1)
        value_sum = value_sum.at[node].add(sign * value)
        return tree.parent[node], (visit, value_sum), depth + 1

    _, (visit, value_sum), _ = jax.lax.while_loop(
        cond, body, (leaf, (tree.visit, tree.value_sum), jnp.int32(0)))
    return tree._replace(visit=visit, value_sum=value_sum)


def expand_and_backup(tree: Tree, leaf: jax.Array, action: jax.Array,
                      child_state: EnvState, child_prior: jax.Array,
                      child_legal: jax.Array, child_value: jax.Array,
                      max_depth: int) -> Tree:
    """Attach the evaluated child (if the leaf edge is expandable) and back
    its value up. For a terminal leaf (``action == -1``) no node is created;
    the leaf's terminal value is backed up instead.

    ``child_value`` must already be the terminal outcome when
    ``child_state.done`` (the search driver substitutes it), from the
    perspective of ``child_state.to_move``.

    Branch-free on purpose: under ``vmap`` a ``lax.cond`` here would lower
    to a select that materializes TWO complete tree copies ([B, N, A]
    arrays) per simulation — measured ~20ms/round at B=1024, cap 401 on a
    v5e, two orders of magnitude over these row-sized scatters. For a
    terminal leaf the child row is still written at ``new_idx`` but
    ``count`` is not advanced, so the slot stays free and is overwritten by
    the next real expansion.
    """
    is_term = action < 0
    new_idx = tree.count
    safe_action = jnp.maximum(action, 0)
    grow = jnp.where(is_term, 0, 1).astype(jnp.int32)

    old_child = tree.children[leaf, safe_action]
    new_child = jnp.where(is_term, old_child, new_idx.astype(jnp.int32))

    t = tree._replace(
        prior=tree.prior.at[new_idx].set(child_prior),
        legal=tree.legal.at[new_idx].set(child_legal),
        expanded=tree.expanded.at[new_idx].set(~is_term),
        parent=tree.parent.at[new_idx].set(jnp.where(is_term, NO_PARENT,
                                                     leaf)),
        action_from_parent=tree.action_from_parent.at[new_idx].set(action),
        children=tree.children.at[leaf, safe_action].set(new_child),
        state=_set_index(tree.state, new_idx, child_state),
        count=tree.count + grow,
    )

    term_value = env.terminal_value(
        jax.tree_util.tree_map(lambda x: x[leaf], tree.state),
        tree.state.to_move[leaf])
    start = jnp.where(is_term, leaf, new_idx)
    value = jnp.where(is_term, term_value, child_value)
    return backup(t, start, value, max_depth)


def root_visit_counts(tree: Tree) -> jax.Array:
    """[A] visit counts of the root's children (0 where unexpanded)."""
    child = tree.children[0]
    has_child = child != UNVISITED
    return jnp.where(has_child, tree.visit[jnp.maximum(child, 0)], 0)


def root_value(tree: Tree) -> jax.Array:
    """Mean search value at the root (root player's POV)."""
    return tree.value_sum[0] / jnp.maximum(tree.visit[0], 1)
