"""Zobrist position hashing with dihedral-8 symmetry keys.

The reference shipped transposition machinery that could never fire: its
MCTS probed ``game.get_zobrist_hash`` / ``game.get_symmetry_hashes``
(/root/reference/src/mcts/mcts.py:237-252,369-383) but neither method is
defined anywhere in the codebase, so the hash was always ``None`` and
every lookup/store short-circuited (SURVEY.md §2.1 "Transposition table
(dead)"). This module is the real hash provider, in two forms:

* **Vectorized** (``hash_states`` / ``symmetry_hashes`` /
  ``canonical_hash``): pure jnp over batched ``EnvState``s — usable inside
  jit for position dedup/bookkeeping at full batch width.
* **Host** (``hash_ints`` / ``symmetry_hashes_ints``): plain-python-int
  hashing of ``(black, white, to_move)`` bitboard triples for the OO game
  surface (``env.game``) and the host transposition table
  (``mcts.transposition``) that finally makes the reference's dead
  feature live.

Keys are generated from a FIXED seed so hashes are stable across
processes and sessions (cache files, logs, and tests can rely on them).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .env import bitboard as env
from .ops import u64
from . import symmetry

_rng = np.random.RandomState(0x5EED0)
# KEYS64[p, sq]: p=0 black stone, p=1 white stone, square = row*8+col
# (the env's LSB-first order, env/bitboard.py)
KEYS64 = _rng.randint(0, 2**64, size=(2, 64), dtype=np.uint64)
TURN64 = np.uint64(_rng.randint(0, 2**64, dtype=np.uint64))

_KEYS_HI = jnp.asarray((KEYS64 >> np.uint64(32)).astype(np.uint32))
_KEYS_LO = jnp.asarray(KEYS64.astype(np.uint32))
_TURN_HI = jnp.uint32(int(TURN64) >> 32)
_TURN_LO = jnp.uint32(int(TURN64) & 0xFFFFFFFF)


def _xor_reduce(x: jax.Array, axis: int) -> jax.Array:
    return jax.lax.reduce(x, jnp.uint32(0), jax.lax.bitwise_xor, (axis,))


def _hash_boards(black64: jax.Array, white64: jax.Array,
                 to_move: jax.Array) -> u64.U64:
    """Hash ``[..., 64]`` bool occupancy planes + side to move."""
    zero = jnp.uint32(0)
    hi = (jnp.where(black64, _KEYS_HI[0], zero)
          ^ jnp.where(white64, _KEYS_HI[1], zero))
    lo = (jnp.where(black64, _KEYS_LO[0], zero)
          ^ jnp.where(white64, _KEYS_LO[1], zero))
    hi, lo = _xor_reduce(hi, hi.ndim - 1), _xor_reduce(lo, lo.ndim - 1)
    is_white = to_move == env.WHITE
    hi = jnp.where(is_white, hi ^ _TURN_HI, hi)
    lo = jnp.where(is_white, lo ^ _TURN_LO, lo)
    return u64.U64(hi, lo)


def _occupancy(states: env.EnvState) -> Tuple[jax.Array, jax.Array]:
    flat = lambda b: b.reshape(*b.shape[:-2], 64)  # noqa: E731
    return (flat(u64.to_board(states.black)),
            flat(u64.to_board(states.white)))


def hash_states(states: env.EnvState) -> u64.U64:
    """Zobrist hash of batched states, as a U64 per state."""
    black64, white64 = _occupancy(states)
    return _hash_boards(black64, white64, states.to_move)


def symmetry_hashes(states: env.EnvState) -> u64.U64:
    """Hashes of all 8 dihedral transforms: U64 with shape ``[..., 8]``.

    ``symmetry_hashes(states)[..., s] == hash_states(transform_s(states))``
    where ``transform_s`` permutes cells by ``symmetry.PERMS[s]``.
    """
    black64, white64 = _occupancy(states)
    perms = jnp.asarray(symmetry.PERMS)  # [8, 64]
    tb = jnp.take(black64, perms, axis=-1)  # [..., 8, 64]
    tw = jnp.take(white64, perms, axis=-1)
    return _hash_boards(tb, tw, states.to_move[..., None])


def canonical_hash(states: env.EnvState) -> u64.U64:
    """Symmetry-invariant key: lexicographic min of the 8 symmetry hashes.

    Equal for all 8 dihedral variants of a position (the key the
    reference's symmetry probe, mcts.py:369-383, wanted to exist).
    """
    h = symmetry_hashes(states)
    min_hi = jnp.min(h.hi, axis=-1)
    lo_masked = jnp.where(h.hi == min_hi[..., None], h.lo,
                          jnp.uint32(0xFFFFFFFF))
    return u64.U64(min_hi, jnp.min(lo_masked, axis=-1))


# --------------------------------------------------------------- host form
_BIT = 1 << np.arange(64, dtype=np.uint64)


def hash_ints(black: int, white: int, to_move: int) -> int:
    """Zobrist hash of host bitboard ints (LSB-first square order)."""
    b = (np.uint64(black) & _BIT).astype(bool)
    w = (np.uint64(white) & _BIT).astype(bool)
    h = np.uint64(0)
    h ^= np.bitwise_xor.reduce(KEYS64[0][b]) if b.any() else np.uint64(0)
    h ^= np.bitwise_xor.reduce(KEYS64[1][w]) if w.any() else np.uint64(0)
    if to_move == env.WHITE:
        h ^= TURN64
    return int(h)


def transform_bits(bits: int, sym: int) -> int:
    """Dihedral transform of a 64-bit occupancy int: output square ``i``
    reads input square ``symmetry.PERMS[sym, i]``."""
    b = (np.uint64(bits) & _BIT).astype(bool)  # b[j] = input bit j
    tb = b[symmetry.PERMS[sym]]  # tb[i] = b[PERMS[s, i]]
    return int(_BIT[tb].sum(dtype=np.uint64))


def symmetry_hashes_ints(black: int, white: int, to_move: int) -> list:
    """All 8 dihedral hashes; index s = hash of the PERMS[s]-transformed
    position. ``min()`` of it is the canonical symmetry-invariant key."""
    return [hash_ints(transform_bits(black, s), transform_bits(white, s),
                      to_move)
            for s in range(symmetry.NUM_SYMS)]
