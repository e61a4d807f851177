"""Host OO wrapper (Board/ReversiGame) parity tests, including move-for-move
cross-checks against the reference implementation in compat mode."""
import sys

import numpy as np
import pytest

from alphazero_reversi_tpu.env.game import BLACK, WHITE, Board, ReversiGame

sys.path.insert(0, "/root/reference")
from src.game.game import ReversiGame as RefGame  # noqa: E402


def test_initial_position():
    g = ReversiGame()
    board = g.get_board_state()
    assert board[3, 3] == WHITE and board[4, 4] == WHITE
    assert board[3, 4] == BLACK and board[4, 3] == BLACK
    assert g.current_player == BLACK
    assert g.get_score() == (2, 2)
    assert not g.is_game_over()


def test_opening_moves():
    g = ReversiGame()
    assert sorted(g.get_valid_moves()) == [(2, 3), (3, 2), (4, 5), (5, 4)]


def test_move_and_capture():
    g = ReversiGame()
    assert g.make_move(2, 3)
    board = g.get_board_state()
    assert board[2, 3] == BLACK and board[3, 3] == BLACK  # flipped
    assert g.current_player == WHITE
    assert len(g.move_history) == 1
    assert g.move_history[0]["move"] == (2, 3)
    # history captured distinct board snapshots
    before = g.move_history[0]["board_before"].get_board_state()
    assert before[2, 3] == 0


def test_invalid_move_rejected():
    g = ReversiGame()
    assert not g.make_move(0, 0)
    assert g.current_player == BLACK
    assert len(g.move_history) == 0


def test_copy_is_deep():
    g = ReversiGame()
    g.make_move(2, 3)
    h = g.copy()
    h.make_move(2, 2)
    assert h.get_score() != g.get_score()


def test_canonical_state_layout():
    g = ReversiGame()
    planes = g.get_canonical_state()
    assert planes.shape == (3, 8, 8)
    # plane 0 = current (black) stones, plane 2 = legal moves
    assert planes[0].sum() == 2
    assert planes[2].sum() == 4


@pytest.mark.parametrize("seed", [0, 1])
def test_full_game_matches_reference(seed):
    """compat mode must track the reference ReversiGame move-for-move."""
    rng = np.random.RandomState(seed)
    ours = ReversiGame(compat=True)
    ref = RefGame()
    plies = 0
    while not ours.is_game_over() and plies < 70:
        moves = ours.get_valid_moves()
        ref_moves = ref.get_valid_moves()
        assert sorted(moves) == sorted(ref_moves), f"ply {plies}"
        mv = moves[rng.randint(len(moves))]
        assert ours.make_move(*mv)
        assert ref.make_move(*mv)
        assert ours.current_player == ref.current_player, f"ply {plies}"
        np.testing.assert_array_equal(ours.get_board_state(),
                                      np.asarray(ref.get_board_state()))
        np.testing.assert_array_equal(ours.get_canonical_state(),
                                      np.asarray(ref.get_canonical_state()))
        plies += 1
    assert ours.is_game_over() == ref.is_game_over()
    if ours.is_game_over():
        ref_winner = ref.get_winner()
        assert ours.get_winner() == (0 if ref_winner is None else ref_winner)
