"""Host-side object API over the functional env — reference surface parity.

Users of the reference interact with ``Board`` (/root/reference/src/game/
board.py:10) and ``ReversiGame`` (/root/reference/src/game/game.py:9) as
mutable single-game objects. This module provides the same surface — method
names, return conventions, move history, canonical-state encoding — as a thin
host wrapper over the batched functional env (``bitboard.py``), for
interactive use, debugging, and drop-in migration. The training/search path
never uses it (it operates on ``EnvState`` batches directly).
"""
from __future__ import annotations

import copy as _copy
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import u64
from . import bitboard as env

EMPTY = env.EMPTY
BLACK = env.BLACK
WHITE = env.WHITE


class Board:
    """Single mutable board, ``src/game/board.py`` surface.

    ``compat=True`` replicates the reference's rule quirks exactly
    (SURVEY.md §2.5); default is correct Othello.
    """

    EMPTY = env.EMPTY
    BLACK = env.BLACK
    WHITE = env.WHITE

    def __init__(self, size: int = 8, compat: bool = False):
        if size != 8:
            raise ValueError("bitboard engine supports 8x8 only")
        self.size = size
        self.compat = compat
        self._state = env.initial_state(())
        self.current_player = BLACK

    # -- state views -------------------------------------------------------
    @property
    def black(self) -> int:
        return u64.to_int(self._state.black)

    @black.setter
    def black(self, value: int) -> None:
        self._state = self._state._replace(black=u64.from_int(value))

    @property
    def white(self) -> int:
        return u64.to_int(self._state.white)

    @white.setter
    def white(self, value: int) -> None:
        self._state = self._state._replace(white=u64.from_int(value))

    @property
    def game_over(self) -> bool:
        return bool(self._state.done)

    @property
    def winner(self) -> Optional[int]:
        """BLACK/WHITE, 0 for draw, None while running
        (board.py:363-373 semantics)."""
        if not self.game_over:
            return None
        return int(self._state.winner)

    def get_board_state(self) -> np.ndarray:
        """[8, 8] int array of EMPTY/BLACK/WHITE (board.py:403-411)."""
        return np.asarray(env.board_array(self._state))

    def get_score(self) -> Tuple[int, int]:
        """(black_count, white_count) (board.py:413-422)."""
        nb, nw = env.score(self._state)
        return int(nb), int(nw)

    # -- rules -------------------------------------------------------------
    def get_valid_moves(self, player: Optional[int] = None
                        ) -> List[Tuple[int, int]]:
        """List of (row, col) placements (board.py:70-133)."""
        p = jnp.int32(player if player is not None else self.current_player)
        bb = env.legal_moves_bb(self._state, p, compat=self.compat)
        bits = u64.to_int(bb)
        return [(i // 8, i % 8) for i in range(64) if (bits >> i) & 1]

    def is_valid_move(self, row: int, col: int,
                      player: Optional[int] = None) -> bool:
        return (row, col) in self.get_valid_moves(player)

    def make_move(self, row: int, col: int,
                  player: Optional[int] = None) -> bool:
        """Apply a placement — or a pass with ``(row, col) == (-1, -1)``
        (board.py:135-251). Auto-pass/termination updates
        ``current_player``/``game_over``/``winner``. Returns False on an
        illegal move, leaving the state unchanged."""
        p = player if player is not None else self.current_player
        if p != int(self._state.to_move):
            return False
        action = env.PASS_ACTION if (row, col) == (-1, -1) else row * 8 + col
        new_state, valid = env.step(self._state, jnp.int32(action),
                                    compat=self.compat)
        if not bool(valid):
            return False
        self._state = new_state
        self.current_player = int(new_state.to_move)
        return True

    def copy(self) -> "Board":
        """Deep copy (board.py:57-68) — unlike the reference's broken
        ``board_optimized.Board.copy`` which returned a fresh board
        (SURVEY.md appendix)."""
        b = Board(self.size, self.compat)
        b._state = self._state
        b.current_player = self.current_player
        return b

    def __str__(self) -> str:
        """ASCII board: X=black, O=white, .=empty, with a1-style axes."""
        grid = self.get_board_state()
        rows = ["  " + " ".join(chr(ord("a") + c) for c in range(self.size))]
        for r in range(self.size):
            cells = " ".join({1: "X", 2: "O", 0: "."}.get(int(v), "?")
                             for v in grid[r])
            rows.append(f"{r + 1} {cells}")
        nb, nw = self.get_score()
        mover = "black (X)" if self.current_player == 1 else "white (O)"
        rows.append(f"X {nb} - O {nw}, {mover} to move")
        return "\n".join(rows)


class ReversiGame:
    """Game-flow wrapper with history (``src/game/game.py:9-192``)."""

    def __init__(self, size: int = 8, compat: bool = False):
        self.size = size
        self.compat = compat
        self.board = Board(size, compat)
        self.move_history: List[Dict] = []

    # properties mirroring game.py state fields
    @property
    def current_player(self) -> int:
        return self.board.current_player

    @property
    def game_over(self) -> bool:
        return self.board.game_over

    @property
    def winner(self) -> Optional[int]:
        return self.board.winner

    def reset(self) -> None:
        self.board = Board(self.size, self.compat)
        self.move_history = []

    def make_move(self, row: int, col: int) -> bool:
        """(game.py:36-70) — records before/after boards in history."""
        if self.game_over:
            return False
        before = self.board.copy()
        player = self.current_player
        if not self.board.make_move(row, col, player):
            return False
        self.move_history.append({
            "player": player,
            "move": (row, col),
            "board_before": before,
            "board_after": self.board.copy(),
        })
        return True

    def get_valid_moves(self) -> List[Tuple[int, int]]:
        return self.board.get_valid_moves()

    def is_game_over(self) -> bool:
        return self.game_over

    def get_winner(self) -> Optional[int]:
        return self.winner

    def get_score(self) -> Tuple[int, int]:
        return self.board.get_score()

    def get_board_state(self) -> np.ndarray:
        return self.board.get_board_state()

    def get_canonical_state(self) -> np.ndarray:
        """3x8x8 float planes from the current player's perspective
        (game.py:131-162): own stones / opponent stones / valid moves.
        CHW layout to match the reference exactly."""
        planes = env.canonical_planes(self.board._state, compat=self.compat,
                                      channels_last=False)
        return np.asarray(planes)

    def copy(self) -> "ReversiGame":
        """(game.py:164-172)"""
        g = ReversiGame(self.size, self.compat)
        g.board = self.board.copy()
        g.move_history = list(self.move_history)
        return g

    def get_zobrist_hash(self) -> int:
        """Position hash. The reference's MCTS probes exactly this method
        name on the game object (mcts.py:242-247) and no implementation
        exists anywhere in its codebase, so its whole transposition
        subsystem was dead (SURVEY.md §2.1) — here the probe would fire."""
        from .. import zobrist

        return zobrist.hash_ints(self.board.black, self.board.white,
                                 self.current_player)

    def get_symmetry_hashes(self) -> List[int]:
        """Hashes of all 8 dihedral variants (the symmetry probe the
        reference's search wanted, mcts.py:369-383)."""
        from .. import zobrist

        return zobrist.symmetry_hashes_ints(self.board.black,
                                            self.board.white,
                                            self.current_player)
