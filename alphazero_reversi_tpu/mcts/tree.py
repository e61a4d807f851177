"""Packed array tree for batched MCTS on TPU.

Replaces the reference's Python pointer tree (``MCTSNode``,
/root/reference/src/mcts/mcts.py:33-188). Third-generation layout, designed
from measured TPU/XLA cost behavior on this hardware (see PERF.md and git
history for the v1 mctx-style struct-of-arrays and v2 packed-row versions):

The binding constraint (profiled at B=1024, cap=401): every dynamic-index op
on the big tree arrays — gather lowering's transposes, scatter's masked
full-array pass, and the while-loop carry copies — costs a *full pass over
the array's bytes*. Round time is therefore proportional to total tree
bytes, and the layout's job is to make every byte count:

* **Sign-encoded priors** (``rows[B, N, RK]`` float32): one column set holds
  ``prior`` where the action is legal and ``-1.0`` where illegal — the
  legality mask costs zero extra columns (decode: ``legal = row >= 0``,
  ``prior = max(row, 0)``). The env state rides in the same row with its
  ``uint32`` bitboard words bit-cast into float lanes, so one tree-descent
  level needs a single dynamic row gather.
* **Packed visit|child edge stats** (``stats[B, N*S]`` flat float32: per
  node ``(1024*visits + child_slot)[A] | value_sum[A]``). Visit counts and
  child slot indices share one f32 exactly (max packed value
  ``1024*sims + cap`` ≪ 2^24): a visit increments by adding 1024, a child
  links by adding its slot once — so the whole backup *and* the expansion's
  child-linking land in ONE scatter-add per simulation round, and the
  child-index plane's 65 columns vanish from every full pass.
* **Edge statistics at the parent** (mctx layout): PUCT reads them with one
  row fetch; no ``visits[children[node]]`` double gather (measured ~0.8 ms
  per level at B=1024 in v1).
* **Static slot allocation**: simulation ``i`` always writes node slot
  ``i+1``, for every game in the batch — a shared-index
  ``dynamic_update_slice`` instead of per-game row scatters.

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

# rows column layout: signed prior [0, A) then packed env state, then the
# node's own NN evaluation (raw value, player-to-move POV — consumed by the
# Gumbel search's mixed-value Q completion; the PUCT path ignores it)
PRIOR = slice(0, A)
S_BLACK_HI = A
S_BLACK_LO = A + 1
S_WHITE_HI = A + 2
S_WHITE_LO = A + 3
S_TO_MOVE = A + 4
S_PASSED = A + 5
S_DONE = A + 6
S_WINNER = A + 7
S_VALUE = A + 8
K = A + 9  # row width

# stats per-node layout (flat stride S): packed visits|child, then vsum
STRIDE = 2 * A
VISITS_OFF = 0  # packed: 1024*visits + child_slot
VSUM_OFF = A

# packing base for visits|child (must exceed any node slot index; the
# packed value 1024*sims + cap stays far below f32's 2^24 exact-int range
# for any practical simulation budget)
PACK = 1024.0


def unpack_visits_child(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """packed f32 -> (visits f32, child_slot f32), both integer-valued."""
    visits = jnp.floor(packed * (1.0 / PACK))
    child = packed - visits * PACK
    return visits, child


class Tree(NamedTuple):
    """Batched packed search tree. ``B`` games, ``N`` node slots."""

    rows: jax.Array  # [B, N, K] f32 — signed prior + env state (write-once)
    stats: jax.Array  # [B, N*S] f32 — packed visits|child, value sums
    root_visit: jax.Array  # [B] i32 — simulations backed up to the root
    root_vsum: jax.Array  # [B] f32 — value sum at the root (root POV)

    @property
    def capacity(self) -> int:
        return self.rows.shape[1]


def make_tree(batch: int, capacity: int) -> Tree:
    assert capacity < PACK, "node slots must pack below the visit base"
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


def make_row(state: EnvState, prior: jax.Array, legal: jax.Array,
             value: jax.Array | None = None) -> jax.Array:
    """Build packed rows [B, K]: sign-encoded prior, env state, raw value."""
    signed = jnp.where(legal, prior, -1.0)
    if value is None:
        value = jnp.zeros(signed.shape[:-1], signed.dtype)
    return jnp.concatenate([signed, pack_state(state), value[..., None]],
                           axis=-1)


def decode_prior_legal(row: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """row [..., K] -> (prior [..., A] f32, legal [..., A] bool)."""
    signed = row[..., PRIOR]
    return jnp.maximum(signed, 0.0), signed >= 0.0


def init_root(tree: Tree, root_state: EnvState, prior: jax.Array,
              legal: jax.Array, value: jax.Array | None = None) -> Tree:
    """Install the root at slot 0 (static index — no scatter)."""
    return tree._replace(
        rows=tree.rows.at[:, 0, :].set(
            make_row(root_state, prior, legal, value)))


def write_children_rows(tree: Tree, slot: jax.Array, new_rows: jax.Array
                        ) -> Tree:
    """Write new node rows at shared slots (one DUS).

    ``new_rows`` is ``[B, L, K]``: every game's ``L`` freshly expanded nodes
    land in the contiguous slots ``slot .. slot+L-1`` — multi-leaf expansion
    still costs a single shared-index ``dynamic_update_slice``.
    """
    return tree._replace(rows=jax.lax.dynamic_update_slice(
        tree.rows, new_rows, (0, slot, 0)))


def backup_and_link(tree: Tree, nodes: jax.Array, actions: jax.Array,
                    value_incs: jax.Array, link_nodes: jax.Array,
                    link_actions: jax.Array, link_slots: jax.Array,
                    do_link: jax.Array) -> Tree:
    """Whole-round backup PLUS child linking in ONE scatter-add per game.

    ``nodes``/``actions``/``value_incs`` are ``[B, P]`` — ALL path entries of
    the round's descents concatenated (``P = leaf_batch * levels``;
    ``node < 0`` entries dropped). Each path entry adds ``PACK`` to the
    packed visits|child cell (a visit) and ``value_incs`` to the vsum cell.
    ``link_*``/``do_link`` are ``[B, L]`` — one entry per freshly expanded
    leaf; each links by adding its slot once to its parent edge's packed
    cell (exact: the slot field starts at 0 and an edge expands at most once
    — in-round duplicate selections are deduplicated by the caller).
    Combining everything into a single ``[B, 2P+L]``-index scatter-add means
    the per-round full-array scatter pass is paid ONCE regardless of how
    many leaves the round expanded.

    An in-place Pallas kernel variant exists (``pallas_backup``, opt-in
    via ``AZR_PALLAS_BACKUP=1``, single-leaf rounds only): isolated it beats
    this scatter ~1.8x, but end-to-end it measures slower (550 vs 591
    moves/s — XLA overlaps the scatter with other round work); outputs are
    exact-equal because every collision cell sums exact small integers.
    """
    from . import pallas_backup

    batch = tree.stats.shape[0]
    if link_nodes.ndim == 1:  # legacy single-leaf call shape
        link_nodes = link_nodes[:, None]
        link_actions = link_actions[:, None]
        link_slots = link_slots[:, None]
        do_link = do_link[:, None]
    if pallas_backup.enabled(batch) and link_nodes.shape[1] == 1:
        link = jnp.stack([
            link_nodes[:, 0],
            link_actions[:, 0],
            jnp.where(do_link[:, 0], link_slots[:, 0], -1),
        ], axis=-1).astype(jnp.int32)
        stats = pallas_backup.backup_and_link_tpu(
            tree.stats, jnp.float32(PACK), nodes.astype(jnp.int32),
            actions.astype(jnp.int32), value_incs.astype(jnp.float32), link)
        return tree._replace(stats=stats)

    m = tree.stats.shape[1]
    ok = nodes >= 0
    base = jnp.maximum(nodes, 0) * STRIDE + actions
    i_vis = jnp.where(ok, base + VISITS_OFF, m)
    i_val = jnp.where(ok, base + VSUM_OFF, m)
    i_link = jnp.where(do_link,
                       link_nodes * STRIDE + VISITS_OFF + link_actions, m)
    idx = jnp.concatenate([i_vis, i_val, i_link], axis=-1)
    upd = jnp.concatenate([
        jnp.full(nodes.shape, PACK, jnp.float32),
        value_incs,
        _f(link_slots) * jnp.ones_like(do_link, jnp.float32),
    ], axis=-1)
    stats = jax.vmap(
        lambda s, i, u: s.at[i].add(u, mode="drop"))(tree.stats, idx, upd)
    return tree._replace(stats=stats)


def gather_node(tree: Tree, node: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """Per-game node fetch -> (row [B, K], stats row [B, S]).

    Both reads are batched row *gathers*. Do NOT use a vmapped
    ``dynamic_slice`` here: XLA:TPU lowers that to a serial while loop over
    the batch (measured: 16 such loops made a simulation round ~30 ms at
    B=1024; as gathers the whole select phase is ~0.4 ms)."""
    row = jax.vmap(lambda r, n: r[n])(tree.rows, node)
    stats3 = tree.stats.reshape(tree.stats.shape[0], -1, STRIDE)
    srow = jax.vmap(lambda s, n: s[n])(stats3, node)
    return row, srow


def root_child_warm_stats(tree: Tree, action: jax.Array
                          ) -> Tuple[jax.Array, jax.Array]:
    """Edge statistics of the root's child reached by ``action`` — the
    1-level tree-reuse carry (``MCTSConfig.tree_reuse="root"``).

    Returns ``(visits [B, A] f32, vsum [B, A] f32)``: the per-action visit
    counts and value sums of the child node the played ``action`` leads to,
    with child-slot links STRIPPED (the subtree below is not carried; a
    warm edge re-expands on first selection). The value sums are already
    from the perspective of the player to move at the child — exactly the
    next search's root POV (``tree.py`` value convention), so the pair can
    seed the next search's slot-0 stats unchanged. Games whose played
    action has no expanded child (possible under temperature sampling)
    return zeros — a fresh search.

    This is the working version of the reference's intended-but-broken
    ``update_with_move`` subtree reuse (/root/reference/src/mcts/mcts.py:
    696-719, which wipes the children it claims to keep — SURVEY.md
    appendix).
    """
    root_packed = tree.stats[:, VISITS_OFF:VISITS_OFF + A]
    child = unpack_visits_child(root_packed)[1]
    onehot = jax.nn.one_hot(action, A, dtype=jnp.float32)
    c1 = (child * onehot).sum(-1).astype(jnp.int32)
    stats3 = tree.stats.reshape(tree.stats.shape[0], -1, STRIDE)
    srow = jax.vmap(lambda s, n: s[n])(stats3, c1)  # [B, S]
    visits = jnp.floor(srow[:, VISITS_OFF:VISITS_OFF + A] * (1.0 / PACK))
    vsum = srow[:, VSUM_OFF:VSUM_OFF + A]
    ok = (c1 > 0)[:, None]
    return jnp.where(ok, visits, 0.0), jnp.where(ok, vsum, 0.0)


def warm_stats_after(stats: jax.Array, a_self: jax.Array,
                     a_opp: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Warm root-edge stats after a 1- or 2-ply descent from a finished
    search's ``stats`` array — the match-play (arena) form of
    :func:`root_child_warm_stats`.

    In alternating play a side's next search roots at the *grandchild* of
    its previous search root: its own move ``a_self``, then the opponent's
    reply ``a_opp``. ``a_opp < 0`` means no opponent move intervened (the
    opponent auto-passed), so the carry descends one level only.
    ``a_self < 0`` (no previous search, or an invalidated carry) and
    missing children return zeros — a cold search. Child-slot links are
    stripped exactly as in :func:`root_child_warm_stats`.
    """
    n = stats.shape[0]
    stats3 = stats.reshape(n, -1, STRIDE)

    def pick_child(packed_row: jax.Array, action: jax.Array) -> jax.Array:
        child = unpack_visits_child(packed_row)[1]
        onehot = jax.nn.one_hot(jnp.maximum(action, 0), A,
                                dtype=jnp.float32)
        return (child * onehot).sum(-1).astype(jnp.int32)

    c1 = pick_child(stats3[:, 0, VISITS_OFF:VISITS_OFF + A], a_self)
    row1 = jax.vmap(lambda s, i: s[i])(stats3, c1)  # [n, S]
    c2 = pick_child(row1[:, VISITS_OFF:VISITS_OFF + A], a_opp)
    use2 = a_opp >= 0
    c = jnp.where(use2, c2, c1)
    rowc = jax.vmap(lambda s, i: s[i])(stats3, c)  # [n, S]
    visits = jnp.floor(rowc[:, VISITS_OFF:VISITS_OFF + A] * (1.0 / PACK))
    vsum = rowc[:, VSUM_OFF:VSUM_OFF + A]
    ok = ((a_self >= 0) & (c1 > 0) & (~use2 | (c2 > 0)))[:, None]
    return jnp.where(ok, visits, 0.0), jnp.where(ok, vsum, 0.0)


def discount_warm(warm_visits: jax.Array, warm_vsum: jax.Array,
                  discount: float) -> Tuple[jax.Array, jax.Array]:
    """Scale a warm stat pair's WEIGHT while preserving its per-edge Q.

    Carried visit counts do two different jobs in a PUCT search: they carry
    *evidence* (Q = vsum/visits) and they steer *allocation* (the
    exploration term divides by N, so heavily warm edges stop being
    explored, and stale evidence gets ~warm-visits of inertia against
    fresh signal). ``discount`` < 1 keeps the evidence but shrinks its
    weight: visits scale by ``discount`` and ROUND TO INTEGERS (the packed
    visits|child cell is exact only for integral visit counts —
    fractional visits would corrupt the child-slot field), and vsum
    rescales by the realized ratio so Q is preserved bit-for-bit on every
    edge that survives rounding.
    """
    wv = jnp.maximum(warm_visits, 0.0)
    scaled = jnp.round(wv * discount)
    q = warm_vsum / jnp.maximum(wv, 1.0)
    return scaled, q * scaled


def seed_root_stats(tree: Tree, warm_visits: jax.Array,
                    warm_vsum: jax.Array, legal: jax.Array) -> Tree:
    """Install warm edge statistics at the root (slot-0 stats row).

    ``warm_visits``/``warm_vsum`` are ``[B, A]`` f32 as produced by
    :func:`root_child_warm_stats`; entries on illegal actions are dropped
    defensively (a legal edge of the previous child is always legal at the
    identical root position, so this only guards caller bugs). Child-slot
    fields start at 0: warm edges look explored (their Q informs selection)
    but unexpanded (first selection re-expands them), which preserves the
    static slot allocation and the depth-staged select bound — a round-r
    descent still needs at most r+1 levels.
    """
    wv = jnp.where(legal, jnp.maximum(warm_visits, 0.0), 0.0)
    ws = jnp.where(legal, warm_vsum, 0.0)
    stats = tree.stats.at[:, VISITS_OFF:VISITS_OFF + A].set(wv * PACK)
    stats = stats.at[:, VSUM_OFF:VSUM_OFF + A].set(ws)
    return tree._replace(
        stats=stats,
        root_visit=wv.sum(-1).astype(jnp.int32),
        root_vsum=ws.sum(-1),
    )


# -- read-side helpers (results, tests, debugging) -------------------------

def root_visit_counts(tree: Tree) -> jax.Array:
    """[B, A] root child visit counts (static slice of node 0)."""
    packed = tree.stats[:, VISITS_OFF:VISITS_OFF + A]
    return unpack_visits_child(packed)[0].astype(jnp.int32)


def root_value(tree: Tree) -> jax.Array:
    """[B] mean root value (root player's POV)."""
    return tree.root_vsum / jnp.maximum(tree.root_visit, 1)


def children_index(tree: Tree) -> jax.Array:
    """[B, N, A] int child slot per edge (0 = no child)."""
    n = tree.capacity
    packed = tree.stats.reshape(tree.stats.shape[0], n, STRIDE)[
        :, :, VISITS_OFF:VISITS_OFF + A]
    return unpack_visits_child(packed)[1].astype(jnp.int32)


def visit_counts(tree: Tree) -> jax.Array:
    """[B, N, A] int per-edge visit counts."""
    n = tree.capacity
    packed = tree.stats.reshape(tree.stats.shape[0], n, STRIDE)[
        :, :, VISITS_OFF:VISITS_OFF + A]
    return unpack_visits_child(packed)[0].astype(jnp.int32)


def node_states(tree: Tree) -> EnvState:
    """EnvState with [B, N]-shaped leaves, unpacked from the rows."""
    return unpack_state(tree.rows[:, :, A:])


def num_linked_nodes(tree: Tree) -> jax.Array:
    """[B] count of nodes reachable via child links, plus the root."""
    return (children_index(tree) > 0).sum(axis=(1, 2)) + 1
