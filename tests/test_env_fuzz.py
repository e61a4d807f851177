"""Batched bit-exactness fuzz: hundreds of full games, every ply compared
bit-for-bit against the C++ oracle, in BOTH rule modes — plus curated
positions that trigger each reference rule quirk (SURVEY.md §2.5), asserted
against the oracle AND the actual reference ``Board``.

This is the round-2 hardening of the bit-exact claim (VERDICT item 9): the
round-1 golden tests covered 5 single games per mode; here the JAX env's own
*batched* code path (the one self-play/arena actually run) generates 512
trajectories per mode in one jitted program and the oracle replays every
move of every game.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.env.oracle import (
    MODE_COMPAT,
    MODE_CORRECT,
    OracleBoard,
)
from alphazero_reversi_tpu.ops import u64

REFERENCE_PATH = "/root/reference"
B = 512
T = 60  # one placement per empty square; auto-pass folds into placements


def _play_batch(compat: bool, seed: int):
    """Play B random-legal-move games in one jitted program; return per-ply
    (action, black, white, to_move, done) history plus final states."""

    @jax.jit
    def run(key):
        states = env.initial_state((B,))

        def body(s, k):
            legal = env.legal_action_mask(s, compat=compat)
            scores = jax.random.uniform(k, (B, env.NUM_ACTIONS))
            action = jnp.argmax(jnp.where(legal, scores, -1.0),
                                axis=-1).astype(jnp.int32)
            ns, valid = env.step(s, action, compat=compat)
            ns = jax.tree_util.tree_map(
                lambda new, old: jnp.where(s.done, old, new), ns, s)
            rec = (jnp.where(s.done, -1, action),
                   ns.black.hi, ns.black.lo, ns.white.hi, ns.white.lo,
                   ns.to_move, ns.done)
            return ns, rec

        final, recs = jax.lax.scan(body, states,
                                   jax.random.split(key, T))
        return final, recs

    final, recs = run(jax.random.PRNGKey(seed))
    return (jax.tree_util.tree_map(np.asarray, final),
            tuple(np.asarray(r) for r in recs))


@pytest.mark.parametrize("mode,compat", [(MODE_CORRECT, False),
                                         (MODE_COMPAT, True)])
def test_batched_trajectories_bit_exact(mode, compat):
    """512 games x both modes: every ply's bitboards, side-to-move and
    termination must match the oracle replaying the same actions."""
    final, (acts, bhi, blo, whi, wlo, tomove, done) = _play_batch(
        compat, seed=20260817)
    games_with_pass = 0
    for b in range(B):
        ob = OracleBoard(mode=mode)
        for t in range(T):
            a = int(acts[t, b])
            if a < 0:  # game already finished; history holds position
                assert ob.game_over
                continue
            prev_player = ob.current_player
            assert ob.step(a), f"oracle rejected game {b} ply {t} action {a}"
            if not ob.game_over and ob.current_player == prev_player:
                games_with_pass += 1
            jb = (int(bhi[t, b]) << 32) | int(blo[t, b])
            jw = (int(whi[t, b]) << 32) | int(wlo[t, b])
            assert jb == ob.black, f"black diverged game {b} ply {t}"
            assert jw == ob.white, f"white diverged game {b} ply {t}"
            assert int(tomove[t, b]) == ob.current_player, \
                f"to_move diverged game {b} ply {t}"
            assert bool(done[t, b]) == ob.game_over, \
                f"done diverged game {b} ply {t}"
        assert ob.game_over, f"game {b} did not finish in {T} plies"
        assert int(final.winner[b]) == (ob.winner or 0), \
            f"winner diverged game {b}"
    # the fuzz exercised the auto-pass path (same player moved twice)
    assert games_with_pass > 0


# ---------------------------------------------------------------------------
# curated quirk positions (SURVEY.md §2.5) — each asserted three ways:
# JAX env == oracle (both modes), oracle-compat == reference Board, and
# correct-mode differs (proving the quirk actually triggers there)
# ---------------------------------------------------------------------------

def _ref_board(black: int, white: int, to_move: int):
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from src.game.board import Board  # noqa: PLC0415
    except ImportError:
        pytest.skip("reference repo not importable")
    finally:
        sys.path.remove(REFERENCE_PATH)
    rb = Board()
    rb.black = black
    rb.white = white
    rb.current_player = to_move
    rb._update_board_state()
    return rb


def _legal_bb_ref(rb) -> int:
    return sum(1 << (r * 8 + c) for r, c in rb.get_valid_moves())


def _check_position(black: int, white: int, to_move: int = 1):
    """Cross-check one position across all three implementations; returns
    (compat legal bb, correct legal bb)."""
    oc = OracleBoard(mode=MODE_COMPAT)
    oc.set_position(black, white, to_move=to_move)
    og = OracleBoard(mode=MODE_CORRECT)
    og.set_position(black, white, to_move=to_move)
    rb = _ref_board(black, white, to_move)

    compat_bb, correct_bb = oc.legal_moves_bb(), og.legal_moves_bb()
    assert compat_bb == _legal_bb_ref(rb), \
        "compat oracle diverged from reference Board on legal moves"

    state = env.initial_state()._replace(
        black=u64.from_int(black), white=u64.from_int(white),
        to_move=jnp.int32(to_move))
    jax_compat = np.asarray(env.legal_action_mask(state, compat=True))[:64]
    jax_correct = np.asarray(env.legal_action_mask(state, compat=False))[:64]
    assert sum(1 << i for i in range(64) if jax_compat[i]) == compat_bb
    assert sum(1 << i for i in range(64) if jax_correct[i]) == correct_bb

    # step every compat-legal move through oracle + reference and compare
    # the post-move boards bit-exactly (covers the flip-mask quirks, not
    # just candidate generation)
    for sq in [i for i in range(64) if compat_bb >> i & 1]:
        o2 = OracleBoard(mode=MODE_COMPAT)
        o2.set_position(black, white, to_move=to_move)
        assert o2.step(sq)
        r2 = _ref_board(black, white, to_move)
        assert r2.make_move(sq // 8, sq % 8)
        assert o2.black == r2.black, f"flip result diverged at square {sq}"
        assert o2.white == r2.white, f"flip result diverged at square {sq}"
        s2, valid = env.step(state, jnp.int32(sq), compat=True)
        assert bool(valid)
        assert u64.to_int(s2.black) == r2.black
        assert u64.to_int(s2.white) == r2.white
    return compat_bb, correct_bb


def test_quirk_wrap_candidate_east():
    """Quirk 1: the unmasked candidate scan (board.py:100-124) wraps
    H-file -> next row A-file; (1,0)=bit 8 becomes 'legal' in compat."""
    compat_bb, correct_bb = _check_position(black=1 << 6, white=1 << 7)
    assert compat_bb >> 8 & 1 == 1
    assert correct_bb >> 8 & 1 == 0


def test_quirk_zero_flip_placement():
    """Quirk 3: a wrap-generated move can pass validity yet flip nothing —
    a stone is placed, no flips happen (board.py:221-227).

    The zero-flip case needs a WEST-generated wrap candidate: the unmasked
    candidate scan runs west (-1) from black (1,0) through white (0,7) to
    (0,6); the flip scan's reverse ray (+1, east) is properly masked at the
    H-file, so the retrace finds no flips."""
    black, white = 1 << 8, 1 << 7  # black (1,0), white (0,7)
    compat_bb, correct_bb = _check_position(black=black, white=white)
    assert compat_bb >> 6 & 1 == 1   # (0,6) 'valid' via west wrap
    assert correct_bb >> 6 & 1 == 0  # illegal in canonical Othello
    oc = OracleBoard(mode=MODE_COMPAT)
    oc.set_position(black, white, to_move=1)
    assert oc.flips(6) == 0  # wrap move flips nothing
    assert oc.step(6)
    assert oc.black == black | (1 << 6)  # stone placed...
    assert oc.white == white             # ...nothing flipped
    rb = _ref_board(black, white, 1)
    assert rb.make_move(0, 6)
    assert rb.black == oc.black and rb.white == oc.white


def test_quirk_westbound_wrong_mask():
    """Quirk 2: westbound flip scans use the EAST masks
    (board.py:196-208 ``edge_masks.get(abs(d))``), so a westward ray can
    wrap A-file -> previous row H-file. Black plays (2,0); the west ray
    wraps to white at (1,7) backed by black at (1,6): compat flips it,
    correct mode must not even allow the move via that ray."""
    black, white = 1 << 14, 1 << 15  # (1,6) black, (1,7) white
    compat_bb, correct_bb = _check_position(black=black, white=white)
    assert compat_bb >> 16 & 1 == 1  # (2,0)=bit 16 'valid' via wrap
    oc = OracleBoard(mode=MODE_COMPAT)
    oc.set_position(black, white, to_move=1)
    assert oc.flips(16) == 1 << 15  # flips the wrapped white stone
    assert correct_bb >> 16 & 1 == 0


def test_quirk_positions_fuzzed_against_reference():
    """Randomized near-edge positions: compat oracle and JAX compat env
    must track the reference Board exactly even where wraps trigger."""
    rng = np.random.default_rng(99)
    checked = 0
    for _ in range(40):
        # random sparse positions biased to board edges
        nb = rng.integers(2, 8)
        nw = rng.integers(2, 8)
        edge = [i for i in range(64)
                if i // 8 in (0, 1, 6, 7) or i % 8 in (0, 1, 6, 7)]
        squares = rng.choice(edge, size=nb + nw, replace=False)
        black = int(sum(1 << int(s) for s in squares[:nb]))
        white = int(sum(1 << int(s) for s in squares[nb:]))
        _check_position(black, white, to_move=int(rng.integers(1, 3)))
        checked += 1
    assert checked == 40
