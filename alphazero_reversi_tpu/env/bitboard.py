"""Vectorized, jit-compatible 8x8 Reversi bitboard environment.

This replaces the reference's per-object Python/Cython board
(/root/reference/src/game/board.py, /root/reference/src/reversi/cython/board.pyx)
with a pure-functional env whose state is a pytree of arrays, designed to step
thousands of games in lockstep under ``jax.jit``/``jax.vmap`` on TPU. All ops
are elementwise uint32 VPU ops; there is no per-board Python control flow.

Two rule modes are provided (selected by the static ``compat`` flag):

* ``compat=False`` (default): **correct Othello rules** — edge-masked
  Dumb7Fill legal-move generation and flip resolution.
* ``compat=True``: bit-exact replication of the reference's pure-Python
  ``Board`` semantics, including its three rule deviations (see SURVEY.md
  §2.5): (1) unmasked candidate propagation in ``get_valid_moves``
  (board.py:100-124) so moves can wrap across board edges, (2) flip-scan edge
  masks keyed by ``abs(direction)`` (board.py:196-208) so westbound rays get
  the eastbound masks, (3) consequently a "valid" move may flip zero stones
  and is still played (board.py:221-227).

Auto-pass / double-pass termination follows ``Board.make_move``
(board.py:232-249): after a placement the opponent moves next; if they have no
move the turn passes back (pass counter = 1); if the original mover also has
none, the game ends and the winner is decided by piece count
(board.py:363-373). An explicit pass action (index 64) is only legal when the
player to move has no placement, matching board.py:151-167.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import u64
from ..ops.u64 import U64

BOARD_SIZE = 8
NUM_SQUARES = 64
PASS_ACTION = 64
NUM_ACTIONS = 65

EMPTY = 0
BLACK = 1
WHITE = 2

# Initial position (board.py:31-32).
INITIAL_BLACK = 0x0000000810000000
INITIAL_WHITE = 0x0000001008000000

# File masks, LSB-first bit order (bit = row*8 + col).
# NOT_FILE_A masks out column 0 (targets of a col+1 move must not wrap there);
# NOT_FILE_H masks out column 7.
NOT_FILE_A = 0xFEFEFEFEFEFEFEFE
NOT_FILE_H = 0x7F7F7F7F7F7F7F7F
FULL = 0xFFFFFFFFFFFFFFFF

# Directions as signed bit shifts: E=+1, W=-1, S=+8, N=-8, SE=+9, NW=-9,
# SW=+7, NE=-7 (row index grows "south"). For correct rules, a shift that
# increases the column (E, SE, NE) must mask out file A afterwards, and one
# that decreases it (W, NW, SW) must mask out file H.
_DIRS = (1, -1, 8, -8, 9, -9, 7, -7)
_CORRECT_MASK = {
    1: NOT_FILE_A,
    -1: NOT_FILE_H,
    8: FULL,
    -8: FULL,
    9: NOT_FILE_A,
    -9: NOT_FILE_H,
    7: NOT_FILE_H,
    -7: NOT_FILE_A,
}
# The reference's flip-scan masks are looked up by abs(direction)
# (board.py:208 ``edge_masks.get(abs(d), ...)``) from a table that is itself
# wrong for the diagonals (board.py:196-203: 7->FEFE.., 9->7F7F..). We
# replicate the *effective* mask per signed direction exactly.
_COMPAT_FLIP_MASK = {
    1: NOT_FILE_A,
    -1: NOT_FILE_A,
    8: FULL,
    -8: FULL,
    7: NOT_FILE_A,
    -7: NOT_FILE_A,
    9: NOT_FILE_H,
    -9: NOT_FILE_H,
}


class EnvState(NamedTuple):
    """Reversi game state. All fields are arrays; vmap over leading dims."""

    black: U64
    white: U64
    to_move: jax.Array  # int32, BLACK (1) or WHITE (2)
    passed: jax.Array  # int32, consecutive passes
    done: jax.Array  # bool
    winner: jax.Array  # int32: 0 draw, BLACK, WHITE. Valid only when done.


def initial_state(batch_shape: Tuple[int, ...] = ()) -> EnvState:
    """Fresh game(s) in the standard starting position."""
    return EnvState(
        black=u64.from_int(INITIAL_BLACK, batch_shape),
        white=u64.from_int(INITIAL_WHITE, batch_shape),
        to_move=jnp.full(batch_shape, BLACK, dtype=jnp.int32),
        passed=jnp.zeros(batch_shape, dtype=jnp.int32),
        done=jnp.zeros(batch_shape, dtype=jnp.bool_),
        winner=jnp.zeros(batch_shape, dtype=jnp.int32),
    )


def _player_boards(state: EnvState, player: jax.Array) -> Tuple[U64, U64]:
    is_black = player == BLACK
    mine = u64.where(is_black, state.black, state.white)
    theirs = u64.where(is_black, state.white, state.black)
    return mine, theirs


def _masked_shift(x: U64, d: int) -> U64:
    """Edge-masked shift for correct Othello ray propagation."""
    return u64.land(u64.shift(x, d), u64.from_int(_CORRECT_MASK[d]))


def legal_moves_bb(state: EnvState, player: jax.Array | None = None,
                   compat: bool = False) -> U64:
    """Bitboard of legal placements for ``player`` (default: side to move).

    ``compat=False``: masked Dumb7Fill. ``compat=True`` replicates the
    reference's unmasked shift-propagate scan (board.py:100-124) which can
    wrap across board edges.
    """
    if player is None:
        player = state.to_move
    mine, theirs = _player_boards(state, player)
    empty = u64.land(u64.lnot(u64.lor(state.black, state.white)),
                     u64.from_int(FULL))
    moves = u64.zeros(state.to_move.shape)
    for d in _DIRS:
        if compat:
            # board.py:107-124 — raw shifts, no edge masks; 1 seed + 5
            # propagate steps, then one more shift into empty squares.
            x = u64.land(u64.shift(mine, d), theirs)
            for _ in range(5):
                x = u64.lor(x, u64.land(u64.shift(x, d), theirs))
            moves = u64.lor(moves, u64.land(u64.shift(x, d), empty))
        else:
            x = u64.land(_masked_shift(mine, d), theirs)
            for _ in range(5):
                x = u64.lor(x, u64.land(_masked_shift(x, d), theirs))
            moves = u64.lor(moves, u64.land(_masked_shift(x, d), empty))
    return moves


def compute_flips(state: EnvState, move_bit: U64, player: jax.Array | None = None,
                  compat: bool = False) -> U64:
    """Bitboard of opponent stones flipped by playing ``move_bit``.

    ``compat=False``: masked ray fill (cannot wrap). ``compat=True``
    replicates the reference's serial ray walk with its mis-keyed edge masks
    (board.py:189-219) exactly, including rays that wrap around the board.
    """
    if player is None:
        player = state.to_move
    mine, theirs = _player_boards(state, player)
    flips = u64.zeros(move_bit.lo.shape)
    for d in _DIRS:
        if compat:
            emask = u64.from_int(_COMPAT_FLIP_MASK[d])
            # board.py:205-219: walk up to 7 raw shifts from the move square
            # while landing on (opponent & edge_mask); accumulate the line;
            # flip it iff the stopping square is (player & edge_mask).
            curr = move_bit
            line = u64.zeros(move_bit.lo.shape)
            alive = jnp.ones(move_bit.lo.shape, dtype=jnp.bool_)
            stop = u64.zeros(move_bit.lo.shape)
            for _ in range(BOARD_SIZE - 1):
                curr = u64.shift(curr, d)
                on_opp = u64.nonzero(u64.land(u64.land(curr, theirs), emask))
                newly_stopped = alive & ~on_opp
                stop = u64.where(newly_stopped, curr, stop)
                line = u64.where(alive & on_opp, u64.lor(line, curr), line)
                alive = alive & on_opp
            # If the walk never broke, the final square held an opponent
            # stone, so the player-check below is False either way.
            stop = u64.where(alive, curr, stop)
            captures = u64.nonzero(u64.land(u64.land(stop, mine), emask))
            flips = u64.where(captures, u64.lor(flips, line), flips)
        else:
            x = u64.land(_masked_shift(move_bit, d), theirs)
            for _ in range(5):
                x = u64.lor(x, u64.land(_masked_shift(x, d), theirs))
            captures = u64.nonzero(u64.land(_masked_shift(x, d), mine))
            flips = u64.where(captures, u64.lor(flips, x), flips)
    return flips


def _winner_from_counts(black: U64, white: U64) -> jax.Array:
    """Piece-count winner (board.py:363-373): BLACK, WHITE, or 0 for draw."""
    nb = u64.popcount(black)
    nw = u64.popcount(white)
    return jnp.where(nb > nw, BLACK, jnp.where(nw > nb, WHITE, 0)).astype(jnp.int32)


def step(state: EnvState, action: jax.Array, compat: bool = False
         ) -> Tuple[EnvState, jax.Array]:
    """Apply ``action`` (0..63 = square, 64 = pass) for the side to move.

    Returns ``(new_state, valid)``. An invalid action (illegal square, pass
    while placements exist, or acting on a finished game) leaves the state
    unchanged and returns ``valid=False``, mirroring ``Board.make_move``'s
    ``False`` return (board.py:135-179).
    """
    action = jnp.asarray(action, dtype=jnp.int32)
    player = state.to_move
    other = 3 - player
    legal_bb = legal_moves_bb(state, player, compat=compat)
    has_moves = u64.nonzero(legal_bb)

    is_pass = action == PASS_ACTION
    move_bit = u64.bit_at(jnp.clip(action, 0, 63))
    on_legal = u64.nonzero(u64.land(move_bit, legal_bb))
    valid = jnp.where(is_pass, ~has_moves, on_legal) & ~state.done

    # --- placement branch (board.py:169-249) ---
    flips = compute_flips(state, move_bit, player, compat=compat)
    placed = u64.lor(move_bit, flips)
    is_black = player == BLACK
    new_black = u64.where(is_black, u64.lxor(state.black, placed),
                          u64.lxor(state.black, flips))
    new_white = u64.where(is_black, u64.lxor(state.white, flips),
                          u64.lxor(state.white, placed))

    after = state._replace(black=new_black, white=new_white)
    opp_has = u64.nonzero(legal_moves_bb(after, other, compat=compat))
    me_has = u64.nonzero(legal_moves_bb(after, player, compat=compat))
    # board.py:242-249: opponent to move; if they can't, turn passes back
    # (passed=1); if the mover also can't, the game is over.
    place_to_move = jnp.where(opp_has, other, player)
    place_passed = jnp.where(opp_has, 0, 1).astype(jnp.int32)
    place_done = ~opp_has & ~me_has
    place_winner = jnp.where(place_done, _winner_from_counts(new_black, new_white), 0)

    # --- pass branch (board.py:151-167) ---
    pass_passed = state.passed + 1
    pass_done = pass_passed >= 2
    pass_winner = jnp.where(pass_done, _winner_from_counts(state.black, state.white), 0)

    new_state = EnvState(
        black=u64.where(is_pass, state.black, new_black),
        white=u64.where(is_pass, state.white, new_white),
        to_move=jnp.where(is_pass, other, place_to_move).astype(jnp.int32),
        passed=jnp.where(is_pass, pass_passed, place_passed).astype(jnp.int32),
        done=jnp.where(is_pass, pass_done, place_done),
        winner=jnp.where(is_pass, pass_winner, place_winner).astype(jnp.int32),
    )
    # Invalid action or finished game: no-op.
    new_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(valid, new, old), new_state, state)
    return new_state, valid


def legal_action_mask(state: EnvState, compat: bool = False) -> jax.Array:
    """``[..., 65]`` bool mask over actions; pass (64) legal iff no placement."""
    bb = legal_moves_bb(state, compat=compat)
    board = u64.to_board(bb).reshape(*state.to_move.shape, NUM_SQUARES)
    can_pass = (~u64.nonzero(bb) & ~state.done)[..., None]
    mask = jnp.concatenate([board, can_pass], axis=-1)
    return mask & ~state.done[..., None]


def canonical_planes(state: EnvState, compat: bool = False,
                     channels_last: bool = True) -> jax.Array:
    """NN input planes matching ``ReversiGame.get_canonical_state``
    (/root/reference/src/game/game.py:131-162): current player's stones,
    opponent stones, legal-move mask — as float32. Default layout is HWC
    (``[..., 8, 8, 3]``), the TPU-native convolution layout; pass
    ``channels_last=False`` for the reference's CHW.
    """
    is_black = state.to_move == BLACK
    mine = u64.where(is_black, state.black, state.white)
    theirs = u64.where(is_black, state.white, state.black)
    legal = legal_moves_bb(state, compat=compat)
    planes = jnp.stack(
        [
            u64.to_board(mine).astype(jnp.float32),
            u64.to_board(theirs).astype(jnp.float32),
            u64.to_board(legal).astype(jnp.float32),
        ],
        axis=-1 if channels_last else -3,
    )
    return planes


def score(state: EnvState) -> Tuple[jax.Array, jax.Array]:
    """(black_count, white_count), as in ``Board.get_score`` (board.py:413)."""
    return u64.popcount(state.black), u64.popcount(state.white)


def board_array(state: EnvState) -> jax.Array:
    """``[..., 8, 8]`` int32 board of EMPTY/BLACK/WHITE values, matching
    ``Board.get_board_state`` (board.py:403-411)."""
    b = u64.to_board(state.black)
    w = u64.to_board(state.white)
    return jnp.where(b, BLACK, jnp.where(w, WHITE, EMPTY)).astype(jnp.int32)


def terminal_value(state: EnvState, player: jax.Array) -> jax.Array:
    """Game outcome in [-1, 1] from ``player``'s perspective (0 if not done)."""
    win = (state.winner == player) & (state.winner != 0)
    lose = (state.winner == (3 - player)) & (state.winner != 0)
    val = jnp.where(win, 1.0, jnp.where(lose, -1.0, 0.0))
    return jnp.where(state.done, val, 0.0).astype(jnp.float32)
