"""Unit and property tests for the vectorized bitboard env.

Covers the reference's ad-hoc test_game.py cases (initial position, opening
moves, capture, termination) plus vectorization properties the reference
never tested (SURVEY.md §4): stone-count conservation, legality invariants.
"""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.ops import u64


def to_rc(action):
    return divmod(int(action), 8)


def test_initial_position():
    s = env.initial_state()
    # test_game.py:7-26 — standard opening diagonal.
    assert u64.to_int(s.black) == 0x0000000810000000
    assert u64.to_int(s.white) == 0x0000001008000000
    b = np.asarray(env.board_array(s))
    assert b[3, 4] == env.BLACK and b[4, 3] == env.BLACK
    assert b[3, 3] == env.WHITE and b[4, 4] == env.WHITE
    assert int(s.to_move) == env.BLACK
    assert not bool(s.done)
    nb, nw = env.score(s)
    assert (int(nb), int(nw)) == (2, 2)


def test_opening_legal_moves():
    # test_game.py:29-39 — black's opening moves are (2,3),(3,2),(4,5),(5,4).
    s = env.initial_state()
    mask = np.asarray(env.legal_action_mask(s))
    squares = {divmod(i, 8) for i in range(64) if mask[i]}
    assert squares == {(2, 3), (3, 2), (4, 5), (5, 4)}
    assert not mask[env.PASS_ACTION]
    # compat mode agrees on the opening position
    mask_c = np.asarray(env.legal_action_mask(s, compat=True))
    np.testing.assert_array_equal(mask, mask_c)


def test_opening_move_flips_and_switches():
    # test_game.py:42-57 — (2,3) flips (3,3); white to move after.
    s = env.initial_state()
    s2, valid = env.step(s, jnp.int32(2 * 8 + 3))
    assert bool(valid)
    b = np.asarray(env.board_array(s2))
    assert b[2, 3] == env.BLACK and b[3, 3] == env.BLACK
    assert int(s2.to_move) == env.WHITE
    nb, nw = env.score(s2)
    assert (int(nb), int(nw)) == (4, 1)


def test_illegal_move_is_noop():
    s = env.initial_state()
    s2, valid = env.step(s, jnp.int32(0))  # corner is not legal at start
    assert not bool(valid)
    assert u64.to_int(s2.black) == u64.to_int(s.black)
    assert int(s2.to_move) == int(s.to_move)
    # pass while placements exist is also invalid (board.py:151-154)
    s3, valid3 = env.step(s, jnp.int32(env.PASS_ACTION))
    assert not bool(valid3)
    assert int(s3.passed) == 0


def _state_from_boards(black_bits, white_bits, to_move=env.BLACK):
    s = env.initial_state()
    return s._replace(
        black=u64.from_int(black_bits),
        white=u64.from_int(white_bits),
        to_move=jnp.int32(to_move),
    )


def test_terminal_by_full_board():
    # Hand-built position: one empty square at (0,0); black plays and wins.
    # Mirrors test_game.py's direct bitboard injection style (:60-126).
    black = 0
    white = 0
    for i in range(1, 64):
        if i == 1:
            white |= 1 << i  # (0,1) white, flipped by (0,0)
        else:
            black |= 1 << i
    s = _state_from_boards(black, white)
    mask = np.asarray(env.legal_action_mask(s))
    assert mask[0]
    s2, valid = env.step(s, jnp.int32(0))
    assert bool(valid)
    assert bool(s2.done)
    assert int(s2.winner) == env.BLACK
    nb, nw = env.score(s2)
    assert int(nb) == 64 and int(nw) == 0


def test_auto_pass():
    # Position where after black's move white has no reply but black does:
    # row 0: B W W W W W W _   -> black plays (0,7), flipping the row.
    # Give black another stone far away so the game doesn't end.
    black = (1 << 0) | (1 << (7 * 8 + 0))
    white = sum(1 << i for i in range(1, 7)) | (1 << (6 * 8 + 1))
    s = _state_from_boards(black, white)
    s2, valid = env.step(s, jnp.int32(7))
    assert bool(valid)
    if not bool(s2.done):
        # whoever moves next must actually have a legal move
        assert np.asarray(env.legal_action_mask(s2))[:64].any()


def test_double_pass_terminates():
    # Black and white each hold isolated stones with no legal captures.
    s = _state_from_boards(1 << 0, 1 << 63)
    mask = np.asarray(env.legal_action_mask(s))
    assert not mask[:64].any() and mask[env.PASS_ACTION]
    s2, v1 = env.step(s, jnp.int32(env.PASS_ACTION))
    assert bool(v1) and not bool(s2.done) and int(s2.passed) == 1
    s3, v2 = env.step(s2, jnp.int32(env.PASS_ACTION))
    assert bool(v2) and bool(s3.done)
    assert int(s3.winner) == 0  # 1-1 draw


def test_canonical_planes():
    s = env.initial_state()
    planes = np.asarray(env.canonical_planes(s))
    assert planes.shape == (8, 8, 3)
    # channel 0: current player (black) stones
    assert planes[3, 4, 0] == 1.0 and planes[3, 3, 0] == 0.0
    assert planes[3, 3, 1] == 1.0
    assert planes[2, 3, 2] == 1.0 and planes[0, 0, 2] == 0.0
    chw = np.asarray(env.canonical_planes(s, channels_last=False))
    assert chw.shape == (3, 8, 8)
    np.testing.assert_array_equal(chw.transpose(1, 2, 0), planes)
    # perspective flips with the player to move
    s2, _ = env.step(s, jnp.int32(2 * 8 + 3))
    planes2 = np.asarray(env.canonical_planes(s2))
    assert planes2[4, 4, 0] == 1.0  # white's stone now in "mine"


def test_vmapped_random_playout_invariants():
    """Play 64 random games in lockstep; check conservation invariants."""
    B = 64
    step_fn = jax.jit(jax.vmap(lambda s, a: env.step(s, a)))
    mask_fn = jax.jit(jax.vmap(env.legal_action_mask))

    states = env.initial_state((B,))
    key = jax.random.PRNGKey(0)
    total_before = None
    for t in range(60):
        mask = mask_fn(states)
        key, sub = jax.random.split(key)
        logits = jnp.where(mask[:, :64], 0.0, -jnp.inf)
        # done games have empty masks; give them a dummy legal=pass path
        any_move = mask[:, :64].any(axis=-1)
        action = jnp.where(
            any_move,
            jax.random.categorical(sub, logits),
            jnp.int32(env.PASS_ACTION),
        )
        nb, nw = env.score(states)
        total_before = nb + nw
        new_states, valid = step_fn(states, action)
        nb2, nw2 = env.score(new_states)
        live = ~states.done & any_move
        # each placement adds exactly one stone (SURVEY.md §4 property)
        np.testing.assert_array_equal(
            np.asarray((nb2 + nw2)[live]), np.asarray((total_before + 1)[live]))
        # every placement flips at least one stone in correct mode
        assert bool(jnp.all(~live | (nw2 - nw != 0) | (nb2 - nb > 1))), t
        states = new_states
    assert bool(states.done.all()), "all games should finish within 60 plies"
    # winners assigned
    winners = np.asarray(states.winner)
    assert set(np.unique(winners)).issubset({0, 1, 2})
