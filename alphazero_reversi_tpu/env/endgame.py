"""Exact endgame solver binding (see ``native/solver.cpp``).

Fail-soft alpha-beta over the final disc differential with a transposition
table — solves the last ~14-20 empties exactly in milliseconds-to-seconds on
one CPU core. An EXTENSION beyond reference parity: the reference
(/root/reference) plays endgames from MCTS statistics alone; an exact solver
converts won endgames perfectly and supplies ground-truth values for
analysis and testing.

The solver shares its rule kernels with the trusted oracle
(``native/rules.h``), so it honors both rule modes: under ``compat`` it
solves the reference's quirky game (SURVEY.md §2.5) — a genuinely different
game tree — not canonical Othello.

Host-side tool: it runs on the CPU play path (``mcts.search.MCTS``, the
analyze CLI), NOT inside jitted/batched device search.

Thread-safe (r4): the native transposition table is lockless with
XOR-validated entries (a torn concurrent write reads as a miss, never a
wrong value), so concurrent solves from multiple threads are safe and
share the table. ``solve_wdl_batch`` exploits this: it fans a batch of
positions out over a native ``std::thread`` pool (ctypes releases the GIL),
which is how the exact-value relabel path parallelizes its ~12k WDL probes
per flagship iteration across host cores (``selfplay.relabel_packed_np``).
"""
from __future__ import annotations

import ctypes
from typing import NamedTuple, Optional, Tuple

import numpy as np

from . import oracle as oracle_lib

PASS_ACTION = 64


class SolveResult(NamedTuple):
    """Exact solve outcome, from the MOVER's perspective.

    value: final disc differential (mover - opponent) under optimal play,
        in [-64, 64]; when solved with a narrowed (alpha, beta) window this
        is a fail-soft bound, exact only inside the window.
    best_move: optimal square 0..63, 64 when the mover must pass, -1 at a
        terminal position.
    nodes: solver nodes visited (for benchmarks/diagnostics).
    """

    value: int
    best_move: int
    nodes: int


_configured = False


def load_library() -> ctypes.CDLL:
    """The solver lives in the same shared library as the oracle
    (``native/liboracle.so``); declare its prototypes once."""
    global _configured
    lib = oracle_lib.load_library()
    if not _configured:
        lib.solver_solve.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint64)]
        lib.solver_solve.restype = ctypes.c_int32
        lib.solver_clear.argtypes = []
        lib.solver_clear.restype = None
        lib.solver_solve_batch.argtypes = [
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint64)]
        lib.solver_solve_batch.restype = ctypes.c_int32
        _configured = True
    return lib


def count_empties(black: int, white: int) -> int:
    return 64 - bin((black | white) & 0xFFFFFFFFFFFFFFFF).count("1")


class EndgameSolver:
    """One rule mode per instance (the native transposition table keys
    entries by mode, so instances may share it safely)."""

    def __init__(self, compat: bool = False):
        self._lib = load_library()
        self.mode = (oracle_lib.MODE_COMPAT if compat
                     else oracle_lib.MODE_CORRECT)

    def solve(self, black: int, white: int, to_move: int, *,
              alpha: int = -64, beta: int = 64,
              passed: int = 0) -> SolveResult:
        """Exact value + optimal move of the position for ``to_move``
        (1=black, 2=white). ``passed`` is whether the previous ply was a
        pass. A narrowed window solves faster but returns fail-soft bounds
        outside it (see ``solve_wdl``)."""
        best = ctypes.c_int32()
        nodes = ctypes.c_uint64()
        value = self._lib.solver_solve(
            ctypes.c_uint64(black), ctypes.c_uint64(white), to_move,
            self.mode, alpha, beta, passed,
            ctypes.byref(best), ctypes.byref(nodes))
        return SolveResult(int(value), int(best.value), int(nodes.value))

    def solve_wdl(self, black: int, white: int, to_move: int, *,
                  passed: int = 0) -> SolveResult:
        """Win/draw/loss probe: the (-1, 1) window answers the sign of the
        value at a fraction of a full solve's cost. ``value`` is then only
        meaningful as its sign."""
        return self.solve(black, white, to_move, alpha=-1, beta=1,
                          passed=passed)

    def solve_wdl_batch(self, black: np.ndarray, white: np.ndarray,
                        to_move: np.ndarray, *,
                        budget_s: Optional[float] = None,
                        num_threads: int = 0
                        ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Win/draw/loss-probe a batch of positions on a native thread pool
        (``num_threads`` 0 = all cores), sharing the lockless transposition
        table. Positions are claimed in array order, so passing them
        empties-ascending keeps the cheapest-first budget semantics: once
        ``budget_s`` wall-clock seconds elapse, the rest stay unsolved
        (``None`` = unlimited; ``0.0`` = deadline already passed, matching
        the historical ``relabel_np`` budget-0 behavior).

        Returns ``(values, solved, nodes)``: int32 fail-soft values (sign =
        WDL, meaningful only where ``solved``), a bool solved mask, and the
        total node count. Recorded self-play positions always have a legal
        move for the mover (the env auto-passes), so no ``passed`` flag is
        needed — terminal/pass roots are still handled natively.
        """
        black = np.ascontiguousarray(black, np.uint64)
        white = np.ascontiguousarray(white, np.uint64)
        to_move = np.ascontiguousarray(to_move, np.int32)
        n = black.shape[0]
        values = np.zeros(n, np.int32)
        solved = np.zeros(n, np.uint8)
        nodes = ctypes.c_uint64()
        self._lib.solver_solve_batch(
            n,
            black.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            white.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            to_move.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.mode, -1, 1,
            # None = unlimited (native: negative). 0.0 keeps the historical
            # relabel_np meaning: deadline already passed, solve ~nothing.
            -1.0 if budget_s is None else float(budget_s),
            int(num_threads),
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            solved.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(nodes))
        return values, solved.astype(bool), int(nodes.value)

    def clear(self) -> None:
        """Clear the native transposition table (shared across instances)."""
        self._lib.solver_clear()
