"""ctypes binding for the native CPU oracle (see ``native/oracle.cpp``).

The oracle is the in-repo trusted implementation of the game rules, used to
verify the JAX env bit-exactly (golden trajectory tests) — the role the
reference's Cython board (/root/reference/src/reversi/cython/board.pyx) was
intended to fill. Builds on first use via the Makefile.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liboracle.so"))

MODE_CORRECT = 0
MODE_COMPAT = 1
PASS_ACTION = 64


class _CState(ctypes.Structure):
    _fields_ = [
        ("black", ctypes.c_uint64),
        ("white", ctypes.c_uint64),
        ("to_move", ctypes.c_int32),
        ("passed", ctypes.c_int32),
        ("done", ctypes.c_int32),
        ("winner", ctypes.c_int32),
    ]


_lib = None


def _build() -> None:
    subprocess.run(
        ["make", "-C", os.path.abspath(_NATIVE_DIR), "liboracle.so"],
        check=True,
        capture_output=True,
    )


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    # ALWAYS invoke make, not just when the .so is absent: make no-ops when
    # the library is fresh and rebuilds when the sources changed — a stale
    # pre-existing build (the .so is not checked in) would otherwise load
    # without newer symbols (e.g. solver_solve) and fail at argtypes setup.
    try:
        _build()
    except (OSError, subprocess.CalledProcessError):
        if not os.path.exists(_LIB_PATH):
            raise  # no toolchain AND no prebuilt library: unusable
        # toolchain unavailable but a build exists — use it as-is
    lib = ctypes.CDLL(_LIB_PATH)
    lib.oracle_reset.argtypes = [ctypes.POINTER(_CState)]
    lib.oracle_legal_moves.argtypes = [
        ctypes.POINTER(_CState), ctypes.c_int32, ctypes.c_int32]
    lib.oracle_legal_moves.restype = ctypes.c_uint64
    lib.oracle_flips.argtypes = [
        ctypes.POINTER(_CState), ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.oracle_flips.restype = ctypes.c_uint64
    lib.oracle_step.argtypes = [
        ctypes.POINTER(_CState), ctypes.c_int32, ctypes.c_int32]
    lib.oracle_step.restype = ctypes.c_int32
    lib.oracle_score.argtypes = [
        ctypes.POINTER(_CState),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.oracle_play.argtypes = [
        ctypes.POINTER(_CState), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32]
    lib.oracle_play.restype = ctypes.c_int32
    _lib = lib
    return lib


class OracleBoard:
    """Python-friendly wrapper over the native oracle, one game instance.

    API mirrors the reference ``Board`` (/root/reference/src/game/board.py)
    where it matters for tests: ``make_move``, ``get_valid_moves``, bit
    fields, ``game_over``, ``winner``.
    """

    def __init__(self, mode: int = MODE_CORRECT):
        self._lib = load_library()
        self._state = _CState()
        self.mode = mode
        self._lib.oracle_reset(ctypes.byref(self._state))

    # -- raw fields -------------------------------------------------------
    @property
    def black(self) -> int:
        return int(self._state.black)

    @property
    def white(self) -> int:
        return int(self._state.white)

    @property
    def current_player(self) -> int:
        return int(self._state.to_move)

    @property
    def passed(self) -> int:
        return int(self._state.passed)

    @property
    def game_over(self) -> bool:
        return bool(self._state.done)

    @property
    def winner(self) -> Optional[int]:
        return int(self._state.winner) if self.game_over else None

    def set_position(self, black: int, white: int, to_move: int = 1,
                     passed: int = 0) -> None:
        self._state.black = black
        self._state.white = white
        self._state.to_move = to_move
        self._state.passed = passed
        self._state.done = 0
        self._state.winner = 0

    # -- game API ---------------------------------------------------------
    def legal_moves_bb(self, player: Optional[int] = None) -> int:
        p = self.current_player if player is None else player
        return int(self._lib.oracle_legal_moves(
            ctypes.byref(self._state), p, self.mode))

    def get_valid_moves(self, player: Optional[int] = None) -> List[Tuple[int, int]]:
        bb = self.legal_moves_bb(player)
        return [divmod(i, 8) for i in range(64) if bb >> i & 1]

    def flips(self, square: int, player: Optional[int] = None) -> int:
        p = self.current_player if player is None else player
        return int(self._lib.oracle_flips(
            ctypes.byref(self._state), square, p, self.mode))

    def step(self, action: int) -> bool:
        """action: 0..63 square index, 64 = pass."""
        return bool(self._lib.oracle_step(
            ctypes.byref(self._state), action, self.mode))

    def make_move(self, row: int, col: int) -> bool:
        if row == -1 and col == -1:
            return self.step(PASS_ACTION)
        return self.step(row * 8 + col)

    def get_score(self) -> Tuple[int, int]:
        b = ctypes.c_int32()
        w = ctypes.c_int32()
        self._lib.oracle_score(ctypes.byref(self._state),
                               ctypes.byref(b), ctypes.byref(w))
        return int(b.value), int(w.value)
