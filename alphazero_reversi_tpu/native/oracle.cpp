// Native CPU oracle for the Reversi bitboard environment.
//
// Plays the role the reference's Cython board
// (/root/reference/src/reversi/cython/board.pyx) was meant to play: a fast,
// trusted native implementation of the game rules used for bit-exact
// trajectory verification of the JAX env and for host-side tooling. The rule
// kernels (both modes, including the compat quirks) live in rules.h, shared
// with the endgame solver (solver.cpp).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
#include <cstdint>
#include <cstring>

#include "rules.h"

using namespace reversi;

extern "C" {

struct OracleState {
  uint64_t black;
  uint64_t white;
  int32_t to_move;  // 1 = black, 2 = white
  int32_t passed;   // consecutive passes
  int32_t done;     // bool
  int32_t winner;   // 0 draw, 1 black, 2 white (valid when done)
};

void oracle_reset(OracleState* s) {
  s->black = 0x0000000810000000ULL;
  s->white = 0x0000001008000000ULL;
  s->to_move = kBlack;
  s->passed = 0;
  s->done = 0;
  s->winner = 0;
}

uint64_t oracle_legal_moves(const OracleState* s, int32_t player, int32_t mode) {
  uint64_t mine = (player == kBlack) ? s->black : s->white;
  uint64_t theirs = (player == kBlack) ? s->white : s->black;
  return legal_moves_bb(mine, theirs, mode);
}

uint64_t oracle_flips(const OracleState* s, int32_t square, int32_t player,
                      int32_t mode) {
  uint64_t mine = (player == kBlack) ? s->black : s->white;
  uint64_t theirs = (player == kBlack) ? s->white : s->black;
  return flips_bb(mine, theirs, square, mode);
}

static void determine_winner(OracleState* s) {
  int nb = popcount64(s->black), nw = popcount64(s->white);
  s->winner = nb > nw ? kBlack : (nw > nb ? kWhite : 0);
}

// Apply action (0..63 square, 64 pass). Returns 1 if valid, 0 if rejected
// (state unchanged), mirroring Board.make_move (board.py:135-251).
int32_t oracle_step(OracleState* s, int32_t action, int32_t mode) {
  if (s->done) return 0;
  int player = s->to_move;
  int other = 3 - player;
  uint64_t legal = oracle_legal_moves(s, player, mode);

  if (action == 64) {  // pass (board.py:151-167)
    if (legal) return 0;
    s->passed += 1;
    s->to_move = other;
    if (s->passed >= 2) {
      s->done = 1;
      determine_winner(s);
    }
    return 1;
  }
  uint64_t move_bit = 1ULL << action;
  if (!(move_bit & legal)) return 0;

  uint64_t flips = oracle_flips(s, action, player, mode);
  if (player == kBlack) {
    s->black ^= move_bit | flips;
    s->white ^= flips;
  } else {
    s->white ^= move_bit | flips;
    s->black ^= flips;
  }
  s->to_move = other;
  s->passed = 0;
  // Auto-pass / termination (board.py:242-249).
  if (!oracle_legal_moves(s, s->to_move, mode)) {
    s->to_move = 3 - s->to_move;
    s->passed += 1;
    if (!oracle_legal_moves(s, s->to_move, mode)) {
      s->done = 1;
      determine_winner(s);
    }
  }
  return 1;
}

void oracle_score(const OracleState* s, int32_t* black, int32_t* white) {
  *black = popcount64(s->black);
  *white = popcount64(s->white);
}

// Batch helper: play a full game from the given state using the provided
// action sequence; stops early on invalid action or game end. Returns the
// number of actions consumed. Used for fast trajectory replay in tests.
int32_t oracle_play(OracleState* s, const int32_t* actions, int32_t n,
                    int32_t mode) {
  int32_t used = 0;
  for (int i = 0; i < n && !s->done; ++i) {
    if (!oracle_step(s, actions[i], mode)) break;
    ++used;
  }
  return used;
}

}  // extern "C"
