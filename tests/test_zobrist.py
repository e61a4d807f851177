"""Zobrist hashing + transposition table — the living replacement for the
reference's dead machinery (mcts.py:14-31,237-320,369-383; no hash
provider ever existed there, SURVEY.md §2.1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu import symmetry, zobrist
from alphazero_reversi_tpu.config import MCTSConfig, ModelConfig
from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.mcts import search as search_lib
from alphazero_reversi_tpu.mcts.transposition import TranspositionTable
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.ops import u64


def _random_states(key, batch=16, moves=10):
    states = env.initial_state((batch,))
    for i in range(moves):
        key, k = jax.random.split(key)
        legal = env.legal_action_mask(states)
        scores = jax.random.uniform(k, (batch, env.NUM_ACTIONS))
        action = jnp.argmax(jnp.where(legal, scores, -1.0),
                            axis=-1).astype(jnp.int32)
        states, _ = env.step(states, action)
    return states


def _transform_states(states, s):
    """Dihedral transform of batched states via the same PERMS convention."""
    def tf(b):
        board = u64.to_board(b).reshape(-1, 64)
        perm = np.asarray(symmetry.PERMS[s])
        out = jnp.asarray(np.asarray(board)[:, perm])
        return u64.from_board(out.reshape(-1, 8, 8))
    return states._replace(black=tf(states.black), white=tf(states.white))


def test_hash_distinct_and_deterministic():
    states = _random_states(jax.random.PRNGKey(0))
    h = zobrist.hash_states(states)
    vals = [(int(a) << 32) | int(b)
            for a, b in zip(np.asarray(h.hi), np.asarray(h.lo))]
    # same position twice -> same hash
    h2 = zobrist.hash_states(states)
    assert np.array_equal(np.asarray(h.hi), np.asarray(h2.hi))
    assert np.array_equal(np.asarray(h.lo), np.asarray(h2.lo))
    # 16 random 10-move positions: all distinct (collision prob ~1e-17)
    assert len(set(vals)) == len(vals)


def test_hash_depends_on_side_to_move():
    states = env.initial_state((1,))
    flipped = states._replace(to_move=jnp.full_like(states.to_move,
                                                    env.WHITE))
    a, b = zobrist.hash_states(states), zobrist.hash_states(flipped)
    assert (int(a.hi[0]), int(a.lo[0])) != (int(b.hi[0]), int(b.lo[0]))


def test_symmetry_hashes_match_transformed_states():
    states = _random_states(jax.random.PRNGKey(1), batch=4)
    sym_h = zobrist.symmetry_hashes(states)  # [B, 8]
    assert sym_h.hi.shape == (4, 8)
    for s in range(symmetry.NUM_SYMS):
        t = _transform_states(states, s)
        ht = zobrist.hash_states(t)
        assert np.array_equal(np.asarray(ht.hi), np.asarray(sym_h.hi[:, s]))
        assert np.array_equal(np.asarray(ht.lo), np.asarray(sym_h.lo[:, s]))


def test_canonical_hash_symmetry_invariant():
    states = _random_states(jax.random.PRNGKey(2), batch=4)
    c0 = zobrist.canonical_hash(states)
    for s in range(1, symmetry.NUM_SYMS):
        cs = zobrist.canonical_hash(_transform_states(states, s))
        assert np.array_equal(np.asarray(c0.hi), np.asarray(cs.hi))
        assert np.array_equal(np.asarray(c0.lo), np.asarray(cs.lo))


def test_host_hash_matches_vectorized():
    states = _random_states(jax.random.PRNGKey(3), batch=8)
    h = zobrist.hash_states(states)
    for i in range(8):
        one = jax.tree_util.tree_map(lambda x: x[i], states)
        hi = zobrist.hash_ints(u64.to_int(one.black), u64.to_int(one.white),
                               int(one.to_move))
        assert hi == (int(h.hi[i]) << 32) | int(h.lo[i])


def test_transform_bits_identity_and_roundtrip():
    bits = 0x123456789ABCDEF0
    assert zobrist.transform_bits(bits, 0) == bits  # PERMS[0] = identity
    for s in range(symmetry.NUM_SYMS):
        t = zobrist.transform_bits(bits, s)
        back = zobrist.transform_bits(t, int(symmetry.INVERSE[s]))
        assert back == bits
        assert bin(t).count("1") == bin(bits).count("1")


def test_game_wrapper_hash_methods():
    """The exact method names the reference's MCTS probes (mcts.py:242-247,
    369-383) exist and work on our game wrapper."""
    from alphazero_reversi_tpu.env.game import ReversiGame

    g = ReversiGame()
    h0 = g.get_zobrist_hash()
    syms = g.get_symmetry_hashes()
    assert syms[0] == h0 and len(syms) == 8
    assert g.make_move(2, 3)
    assert g.get_zobrist_hash() != h0
    # matches the vectorized hash of the same position
    assert g.get_zobrist_hash() == zobrist.hash_ints(
        g.board.black, g.board.white, g.current_player)


def test_transposition_symmetry_lookup():
    tt = TranspositionTable()
    # an ASYMMETRIC position: for self-symmetric positions (e.g. the
    # standard opening, which maps to itself under 180deg rotation) the
    # hit orientation is inherently ambiguous — and harmless, since real
    # search counts of a self-symmetric position share its symmetry.
    black, white = (1 << 19) | (1 << 28) | (1 << 35), (1 << 27) | (1 << 44)
    assert len(set(zobrist.symmetry_hashes_ints(black, white,
                                                env.BLACK))) == 8
    counts = np.zeros(65, np.float32)
    counts[19] = 30.0
    counts[26] = 10.0
    counts[64] = 2.0
    tt.store(black, white, env.BLACK, counts, 0.25)

    # exact hit
    got, val = tt.lookup(black, white, env.BLACK)
    assert val == 0.25 and np.array_equal(got, counts)

    # hit through every symmetry, counts permuted back to the query frame
    for s in range(1, symmetry.NUM_SYMS):
        tb = zobrist.transform_bits(black, s)
        tw = zobrist.transform_bits(white, s)
        got, val = tt.lookup(tb, tw, env.BLACK)
        assert val == 0.25
        # query = transform_s(stored): policy_query[i] = counts[PERMS[s][i]]
        expected = np.concatenate([counts[symmetry.PERMS[s]], counts[64:]])
        assert np.array_equal(got, expected), f"sym {s}"

    # wrong side to move / different position -> miss
    assert tt.lookup(black, white, env.WHITE) is None
    assert tt.lookup(white, black, env.BLACK) is None
    assert tt.hits == 8 and tt.misses == 2


def test_transposition_capacity_lru():
    tt = TranspositionTable(capacity=2)
    c = np.ones(65, np.float32)
    tt.store(1, 2, env.BLACK, c, 0.0)
    tt.store(4, 8, env.BLACK, c, 0.0)
    tt.lookup(1, 2, env.BLACK)  # refresh entry 1
    tt.store(16, 32, env.BLACK, c, 0.0)  # evicts (4, 8)
    assert tt.lookup(4, 8, env.BLACK) is None
    assert tt.lookup(1, 2, env.BLACK) is not None
    assert len(tt) == 2


def test_mcts_uses_transposition_table():
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      compute_dtype="float32")
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    tt = TranspositionTable()
    mcts = search_lib.MCTS(net, variables,
                           MCTSConfig(num_simulations=8, max_depth=4),
                           transposition_table=tt)
    states = env.initial_state((1,))

    probs1, r1 = mcts.get_action_probs(states, jax.random.PRNGKey(1),
                                       add_noise=False)
    assert tt.misses == 1 and tt.hits == 0 and len(tt) == 1
    probs2, r2 = mcts.get_action_probs(states, jax.random.PRNGKey(2),
                                       add_noise=False)
    assert tt.hits == 1
    assert np.array_equal(np.asarray(probs1), np.asarray(probs2))
    assert np.array_equal(np.asarray(r1.visit_counts),
                          np.asarray(r2.visit_counts))

    # the mirrored opening hits through symmetry with permuted counts
    mirrored = _transform_states(states, 1)
    _, r3 = mcts.get_action_probs(mirrored, jax.random.PRNGKey(3),
                                  add_noise=False)
    assert tt.hits == 2
    expected = np.asarray(r1.visit_counts[0])[
        np.concatenate([symmetry.PERMS[1], [64]])]
    assert np.array_equal(np.asarray(r3.visit_counts[0]), expected)

    # noised queries bypass the table (not a function of the position)
    mcts.get_action_probs(states, jax.random.PRNGKey(4), add_noise=True)
    assert tt.hits == 2 and len(tt) == 1

def test_compat_mcts_disables_symmetry_lookup():
    """compat rules are not dihedral-equivariant (edge-wrap/west-mask quirks
    single out east/west), so a compat MCTS must downgrade the TT to
    exact-position keys — and refuse a pre-populated symmetry-keyed table."""
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      compute_dtype="float32")
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    tt = TranspositionTable()
    assert tt.use_symmetry
    mcts = search_lib.MCTS(net, variables,
                           MCTSConfig(num_simulations=4, max_depth=4),
                           compat=True, transposition_table=tt)
    assert not tt.use_symmetry

    states = env.initial_state((1,))
    mcts.get_action_probs(states, jax.random.PRNGKey(1), add_noise=False)
    assert tt.misses == 1
    # the mirrored opening must NOT hit through symmetry in compat mode
    mirrored = _transform_states(states, 1)
    mcts.get_action_probs(mirrored, jax.random.PRNGKey(2), add_noise=False)
    assert tt.hits == 0 and tt.misses == 2

    stale = TranspositionTable()
    stale.store(0x1, 0x2, env.BLACK, np.zeros(65, np.float32), 0.0)
    with pytest.raises(ValueError):
        search_lib.MCTS(net, variables, MCTSConfig(num_simulations=4),
                        compat=True, transposition_table=stale)


def test_tt_invalidated_on_variables_swap():
    """Cached searches are a function of the weights: promoting a new model
    (the pipeline pattern `mcts.variables = new`) must clear the table."""
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      compute_dtype="float32")
    net = resnet.build_network(cfg)
    v1 = resnet.init_variables(net, jax.random.PRNGKey(0))
    v2 = resnet.init_variables(net, jax.random.PRNGKey(9))
    tt = TranspositionTable()
    mcts = search_lib.MCTS(net, v1, MCTSConfig(num_simulations=4,
                                               max_depth=4),
                           transposition_table=tt)
    states = env.initial_state((1,))
    mcts.get_action_probs(states, jax.random.PRNGKey(1), add_noise=False)
    assert len(tt) == 1
    mcts.variables = v2
    assert len(tt) == 0
    p2, _ = mcts.get_action_probs(states, jax.random.PRNGKey(2),
                                  add_noise=False)
    assert tt.misses == 2  # re-searched with the new weights


def test_transposition_gumbel_entries_kind_and_symmetry():
    """Gumbel entries carry (action_probs, chosen_action), never satisfy a
    PUCT query (and vice versa), and a symmetry hit permutes the chosen
    action along with the arrays (pass stays pass)."""
    tt = TranspositionTable()
    black, white = (1 << 19) | (1 << 28) | (1 << 35), (1 << 27) | (1 << 44)
    counts = np.zeros(65, np.float32)
    counts[19], counts[26] = 12.0, 4.0
    probs = np.zeros(65, np.float32)
    probs[19], probs[26] = 0.7, 0.3
    tt.store(black, white, env.BLACK, counts, 0.1,
             action_probs=probs, chosen_action=19)

    # kind separation: a PUCT query misses on a Gumbel entry
    assert tt.lookup(black, white, env.BLACK) is None
    got = tt.lookup_gumbel(black, white, env.BLACK)
    assert got is not None
    c, v, p, chosen = got
    assert chosen == 19 and v == np.float32(0.1)
    assert np.array_equal(c, counts) and np.array_equal(p, probs)

    # symmetry hit: arrays AND the winner permute to the query frame
    for s in range(1, symmetry.NUM_SYMS):
        tb = zobrist.transform_bits(black, s)
        tw = zobrist.transform_bits(white, s)
        c, v, p, chosen = tt.lookup_gumbel(tb, tw, env.BLACK)
        expected_c = np.concatenate([counts[symmetry.PERMS[s]], counts[64:]])
        expected_p = np.concatenate([probs[symmetry.PERMS[s]], probs[64:]])
        assert np.array_equal(c, expected_c), f"sym {s}"
        assert np.array_equal(p, expected_p), f"sym {s}"
        assert chosen == int(np.where(symmetry.PERMS[s] == 19)[0][0]), \
            f"sym {s}"

    # a PUCT entry never satisfies a Gumbel query
    tt2 = TranspositionTable()
    tt2.store(black, white, env.BLACK, counts, 0.1)
    assert tt2.lookup_gumbel(black, white, env.BLACK) is None
    assert tt2.lookup(black, white, env.BLACK) is not None

    # a stored pass winner survives symmetry unchanged
    tt3 = TranspositionTable()
    tt3.store(black, white, env.BLACK, counts, 0.0,
              action_probs=probs, chosen_action=64)
    tb = zobrist.transform_bits(black, 3)
    tw = zobrist.transform_bits(white, 3)
    assert tt3.lookup_gumbel(tb, tw, env.BLACK)[3] == 64


def test_tt_kinds_coexist_without_thrash():
    """A position searched by BOTH algorithms caches both results side by
    side (keys carry the kind): neither store evicts the other, and a
    kind-mismatched probe neither refreshes LRU nor overwrites anything
    (round-2 review finding: single-keyed entries thrashed when two MCTS
    instances shared one table)."""
    tt = TranspositionTable()
    black, white = (1 << 19) | (1 << 28), (1 << 27) | (1 << 44)
    counts_p = np.zeros(65, np.float32)
    counts_p[19] = 7.0
    counts_g = np.zeros(65, np.float32)
    counts_g[26] = 3.0
    probs_g = np.zeros(65, np.float32)
    probs_g[26] = 1.0

    tt.store(black, white, env.BLACK, counts_p, 0.5)  # puct
    tt.store(black, white, env.BLACK, counts_g, -0.5,  # gumbel
             action_probs=probs_g, chosen_action=26)
    assert len(tt) == 2  # both kinds cached for one position

    got_p = tt.lookup(black, white, env.BLACK)
    got_g = tt.lookup_gumbel(black, white, env.BLACK)
    assert got_p is not None and got_p[1] == np.float32(0.5)
    assert np.array_equal(got_p[0], counts_p)
    assert got_g is not None and got_g[1] == np.float32(-0.5)
    assert got_g[3] == 26
    assert tt.hits == 2 and tt.misses == 0

    # kind-mismatch on a position cached only under the other kind: miss,
    # nothing evicted
    tt2 = TranspositionTable()
    tt2.store(black, white, env.BLACK, counts_p, 0.5)
    assert tt2.lookup_gumbel(black, white, env.BLACK) is None
    assert len(tt2) == 1 and tt2.misses == 1
    assert tt2.lookup(black, white, env.BLACK) is not None
