"""Packed array tree for batched MCTS on TPU.

Replaces the reference's Python pointer tree (``MCTSNode``,
/root/reference/src/mcts/mcts.py:33-188). Second-generation layout, designed
from measured TPU/XLA cost behavior on this hardware (see git history for the
first, mctx-style struct-of-arrays version):

* **One packed row per node** (``rows[B, N, K]`` float32): prior over the 65
  actions, legal mask, and the node's env state with its ``uint32`` bitboard
  words bit-cast into float lanes. One tree-descent level then needs a
  single dynamic row gather instead of ~8 separate gathers across parallel
  arrays — measured, the number of *dynamic-index ops per loop iteration*
  (not bytes moved) is what dominates this workload on TPU.
* **Edge statistics at the parent** (``stats[B, N*3A]`` flat float32: per
  node ``visits[A] | value_sum[A] | child_index[A]``). PUCT reads them with
  one dynamic slice; the child lookup needs no second indirection (the
  mctx-style ``visits[children[node]]`` double gather measured ~0.8 ms per
  level at B=1024 — the single most expensive op in the v1 tree).
* **Static slot allocation**: simulation ``i`` always writes node slot
  ``i+1``, for every game in the batch — a shared-index
  ``dynamic_update_slice`` instead of per-game scatters. Slots of
  simulations that ended on a terminal or depth-truncated node are simply
  never linked (no ``count`` bookkeeping under ``jit``).

Value convention: ``value_sum[n, a]`` accumulates backed-up values **from
the perspective of the player to move at node n**, so PUCT needs no sign
correction at selection time; the backup applies the sign per path level
(player-change aware, which handles auto-pass chains — see
``search.run_search``).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..env import bitboard as env
from ..env.bitboard import EnvState
from ..ops.u64 import U64

NUM_ACTIONS = env.NUM_ACTIONS
A = NUM_ACTIONS

# rows column layout
PRIOR = slice(0, A)
LEGAL = slice(A, 2 * A)
S_BLACK_HI = 2 * A
S_BLACK_LO = 2 * A + 1
S_WHITE_HI = 2 * A + 2
S_WHITE_LO = 2 * A + 3
S_TO_MOVE = 2 * A + 4
S_PASSED = 2 * A + 5
S_DONE = 2 * A + 6
S_WINNER = 2 * A + 7
K = 2 * A + 8  # row width

# stats per-node layout (flat stride 3A)
STRIDE = 3 * A
VISITS_OFF = 0
VSUM_OFF = A
CHILD_OFF = 2 * A


class Tree(NamedTuple):
    """Batched packed search tree. ``B`` games, ``N`` node slots."""

    rows: jax.Array  # [B, N, K] f32 — static per-node data (written once)
    stats: jax.Array  # [B, N*3A] f32 — edge visits / value sums / child idx
    root_visit: jax.Array  # [B] i32 — simulations backed up to the root
    root_vsum: jax.Array  # [B] f32 — value sum at the root (root POV)

    @property
    def capacity(self) -> int:
        return self.rows.shape[1]


def make_tree(batch: int, capacity: int) -> Tree:
    return Tree(
        rows=jnp.zeros((batch, capacity, K), jnp.float32),
        stats=jnp.zeros((batch, capacity * STRIDE), jnp.float32),
        root_visit=jnp.zeros((batch,), jnp.int32),
        root_vsum=jnp.zeros((batch,), jnp.float32),
    )


def _f(x) -> jax.Array:
    return x.astype(jnp.float32)


def pack_state(state: EnvState) -> jax.Array:
    """EnvState[B] -> [B, 8] f32 row segment (bitboards bit-cast)."""
    bc = lambda w: jax.lax.bitcast_convert_type(w, jnp.float32)
    return jnp.stack([
        bc(state.black.hi), bc(state.black.lo),
        bc(state.white.hi), bc(state.white.lo),
        _f(state.to_move), _f(state.passed), _f(state.done),
        _f(state.winner),
    ], axis=-1)


def unpack_state(cols: jax.Array) -> EnvState:
    """[..., 8] f32 row segment -> EnvState with [...]-shaped leaves."""
    bc = lambda w: jax.lax.bitcast_convert_type(w, jnp.uint32)
    return EnvState(
        black=U64(hi=bc(cols[..., 0]), lo=bc(cols[..., 1])),
        white=U64(hi=bc(cols[..., 2]), lo=bc(cols[..., 3])),
        to_move=cols[..., 4].astype(jnp.int32),
        passed=cols[..., 5].astype(jnp.int32),
        done=cols[..., 6] > 0.5,
        winner=cols[..., 7].astype(jnp.int32),
    )


def make_row(state: EnvState, prior: jax.Array, legal: jax.Array
             ) -> jax.Array:
    """Build packed rows [B, K] for newly evaluated nodes."""
    return jnp.concatenate(
        [prior, _f(legal), pack_state(state)], axis=-1)


def init_root(tree: Tree, root_state: EnvState, prior: jax.Array,
              legal: jax.Array) -> Tree:
    """Install the root at slot 0 (static index — no scatter)."""
    return tree._replace(
        rows=tree.rows.at[:, 0, :].set(make_row(root_state, prior, legal)))


def write_children_rows(tree: Tree, slot: jax.Array, new_rows: jax.Array
                        ) -> Tree:
    """Write every game's new node at the shared ``slot`` (one DUS)."""
    return tree._replace(rows=jax.lax.dynamic_update_slice(
        tree.rows, new_rows[:, None, :], (0, slot, 0)))


def link_children(tree: Tree, node: jax.Array, action: jax.Array,
                  slot: jax.Array, do_link: jax.Array) -> Tree:
    """Set ``child_index[node, action] = slot`` where ``do_link``
    (others scattered out of bounds and dropped)."""
    m = tree.stats.shape[1]
    idx = jnp.where(do_link, node * STRIDE + CHILD_OFF + action, m)
    stats = jax.vmap(
        lambda s, i, v: s.at[i].set(v, mode="drop")
    )(tree.stats, idx, jnp.broadcast_to(_f(slot), node.shape))
    return tree._replace(stats=stats)


def edge_update(tree: Tree, node: jax.Array, action: jax.Array,
                visit_inc: jax.Array, value_inc: jax.Array) -> Tree:
    """One backup level: ``visits[node, action] += visit_inc``,
    ``value_sum[node, action] += value_inc``. ``node < 0`` rows dropped."""
    m = tree.stats.shape[1]
    ok = node >= 0
    safe = jnp.maximum(node, 0)
    i1 = jnp.where(ok, safe * STRIDE + VISITS_OFF + action, m)
    i2 = jnp.where(ok, safe * STRIDE + VSUM_OFF + action, m)
    stats = jax.vmap(
        lambda s, j1, j2, vi, vv: s.at[j1].add(vi, mode="drop")
                                   .at[j2].add(vv, mode="drop")
    )(tree.stats, i1, i2, visit_inc, value_inc)
    return tree._replace(stats=stats)


def edge_update_path(tree: Tree, nodes: jax.Array, actions: jax.Array,
                     visit_incs: jax.Array, value_incs: jax.Array) -> Tree:
    """Whole-path backup in ONE scatter-add per game.

    ``nodes``/``actions``/``visit_incs``/``value_incs`` are ``[B, L]`` (one
    column per path level, ``node < 0`` entries dropped). Combines the visit
    and value updates of every level into a single ``[B, 2L]``-index
    scatter-add into the flat stats row — measured on v5e, one scatter of 2L
    elements costs about the same as one scalar scatter (~0.1 ms at B=1024),
    so this replaces the ~L chained scatters of per-level ``edge_update``
    (~1.75 ms at L=16) with one op. Duplicate indices (a path revisiting an
    edge cannot happen, but auto-pass chains can alias) accumulate correctly:
    XLA scatter-add sums all contributions.
    """
    m = tree.stats.shape[1]
    ok = nodes >= 0
    safe = jnp.maximum(nodes, 0)
    base = safe * STRIDE + actions
    i_vis = jnp.where(ok, base + VISITS_OFF, m)
    i_val = jnp.where(ok, base + VSUM_OFF, m)
    idx = jnp.concatenate([i_vis, i_val], axis=-1)  # [B, 2L]
    upd = jnp.concatenate([visit_incs, value_incs], axis=-1)  # [B, 2L]
    stats = jax.vmap(
        lambda s, i, u: s.at[i].add(u, mode="drop"))(tree.stats, idx, upd)
    return tree._replace(stats=stats)


def gather_node(tree: Tree, node: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """Per-game node fetch -> (row [B, K], stats row [B, 3A]).

    Both reads are batched row *gathers*. Do NOT use a vmapped
    ``dynamic_slice`` here: XLA:TPU lowers that to a serial while loop over
    the batch (measured: 16 such loops made a simulation round ~30 ms at
    B=1024; as gathers the whole select phase is ~0.4 ms)."""
    row = jax.vmap(lambda r, n: r[n])(tree.rows, node)
    stats3 = tree.stats.reshape(tree.stats.shape[0], -1, STRIDE)
    srow = jax.vmap(lambda s, n: s[n])(stats3, node)
    return row, srow


# -- read-side helpers (results, tests, debugging) -------------------------

def root_visit_counts(tree: Tree) -> jax.Array:
    """[B, A] root child visit counts (static slice of node 0)."""
    return tree.stats[:, VISITS_OFF:VISITS_OFF + A].astype(jnp.int32)


def root_value(tree: Tree) -> jax.Array:
    """[B] mean root value (root player's POV)."""
    return tree.root_vsum / jnp.maximum(tree.root_visit, 1)


def children_index(tree: Tree) -> jax.Array:
    """[B, N, A] int child slot per edge (0 = no child)."""
    n = tree.capacity
    return tree.stats.reshape(tree.stats.shape[0], n, STRIDE)[
        :, :, CHILD_OFF:CHILD_OFF + A].astype(jnp.int32)


def node_states(tree: Tree) -> EnvState:
    """EnvState with [B, N]-shaped leaves, unpacked from the rows."""
    return unpack_state(tree.rows[:, :, 2 * A:])


def num_linked_nodes(tree: Tree) -> jax.Array:
    """[B] count of nodes reachable via child links, plus the root."""
    return (children_index(tree) > 0).sum(axis=(1, 2)) + 1
