// Native CPU oracle for the Reversi bitboard environment.
//
// Plays the role the reference's Cython board
// (/root/reference/src/reversi/cython/board.pyx) was meant to play: a fast,
// trusted native implementation of the game rules used for bit-exact
// trajectory verification of the JAX env and for host-side tooling. Two rule
// modes are implemented:
//   mode 0 ("correct"):  canonical Othello rules, edge-masked ray fills.
//   mode 1 ("compat"):   move-for-move replication of the reference's pure
//                        Python Board (/root/reference/src/game/board.py),
//                        including its edge-wrap quirks (SURVEY.md §2.5):
//                        unmasked candidate propagation in move generation
//                        (board.py:100-124) and abs(direction)-keyed flip
//                        masks (board.py:196-208).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
#include <cstdint>
#include <cstring>

extern "C" {

struct OracleState {
  uint64_t black;
  uint64_t white;
  int32_t to_move;  // 1 = black, 2 = white
  int32_t passed;   // consecutive passes
  int32_t done;     // bool
  int32_t winner;   // 0 draw, 1 black, 2 white (valid when done)
};

static const int kBlack = 1;
static const int kWhite = 2;
static const uint64_t kNotFileA = 0xFEFEFEFEFEFEFEFEULL;  // col != 0
static const uint64_t kNotFileH = 0x7F7F7F7F7F7F7F7FULL;  // col != 7
static const uint64_t kFull = 0xFFFFFFFFFFFFFFFFULL;

// Directions as signed shifts: E=+1, W=-1, S=+8, N=-8, SE=+9, NW=-9, SW=+7,
// NE=-7 (bit = row*8 + col, row grows south).
static const int kDirs[8] = {1, -1, 8, -8, 9, -9, 7, -7};

static inline uint64_t raw_shift(uint64_t x, int d) {
  return d >= 0 ? (x << d) : (x >> -d);
}

static inline uint64_t correct_mask(int d) {
  switch (d) {
    case 1: case 9: case -7: return kNotFileA;   // col+1 moves
    case -1: case -9: case 7: return kNotFileH;  // col-1 moves
    default: return kFull;                       // N/S
  }
}

// The reference looks flip masks up by abs(d) from a table whose diagonal
// entries are themselves swapped (board.py:196-208). Effective mask per
// signed direction:
static inline uint64_t compat_flip_mask(int d) {
  switch (d) {
    case 1: case -1: case 7: case -7: return kNotFileA;
    case 9: case -9: return kNotFileH;
    default: return kFull;
  }
}

static inline uint64_t masked_shift(uint64_t x, int d) {
  return raw_shift(x, d) & correct_mask(d);
}

static int popcount64(uint64_t x) { return __builtin_popcountll(x); }

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
  uint64_t empty = ~(s->black | s->white);
  uint64_t moves = 0;
  for (int i = 0; i < 8; ++i) {
    int d = kDirs[i];
    if (mode == 1) {
      // board.py:107-124 — raw, unmasked shift-propagate (can wrap edges).
      uint64_t x = raw_shift(mine, d) & theirs;
      for (int k = 0; k < 5; ++k) x |= raw_shift(x, d) & theirs;
      moves |= raw_shift(x, d) & empty;
    } else {
      uint64_t x = masked_shift(mine, d) & theirs;
      for (int k = 0; k < 5; ++k) x |= masked_shift(x, d) & theirs;
      moves |= masked_shift(x, d) & empty;
    }
  }
  return moves;
}

uint64_t oracle_flips(const OracleState* s, int32_t square, int32_t player,
                      int32_t mode) {
  uint64_t mine = (player == kBlack) ? s->black : s->white;
  uint64_t theirs = (player == kBlack) ? s->white : s->black;
  uint64_t move_bit = 1ULL << square;
  uint64_t flips = 0;
  for (int i = 0; i < 8; ++i) {
    int d = kDirs[i];
    if (mode == 1) {
      // board.py:205-219 — serial ray walk with abs()-keyed edge masks.
      uint64_t em = compat_flip_mask(d);
      uint64_t curr = move_bit;
      uint64_t line = 0;
      for (int k = 0; k < 7; ++k) {
        curr = raw_shift(curr, d);
        if (!(curr & theirs & em)) break;
        line |= curr;
      }
      if (curr & mine & em) flips |= line;
    } else {
      uint64_t x = masked_shift(move_bit, d) & theirs;
      for (int k = 0; k < 5; ++k) x |= masked_shift(x, d) & theirs;
      if (masked_shift(x, d) & mine) flips |= x;
    }
  }
  return flips;
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
