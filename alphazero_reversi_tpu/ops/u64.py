"""Emulated 64-bit unsigned integer ops for TPU.

TPUs have no native 64-bit integer ALU; XLA emulates ``uint64`` with pairs of
32-bit words anyway, and enabling ``jax_enable_x64`` globally changes default
float dtypes across the whole program. We instead represent a 64-bit bitboard
explicitly as a pytree of two ``uint32`` arrays ``(hi, lo)`` and implement the
handful of operations a Reversi engine needs (and/or/xor/not, small constant
shifts, popcount, plane conversion). Every op is a pure elementwise VPU op and
vmaps/shards trivially.

Bit order follows the reference engine (/root/reference/src/game/board.py:49):
bit ``i = row * 8 + col``, LSB-first, so ``lo`` holds rows 0-3 and ``hi`` rows
4-7 of the 8x8 board.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

_U32_MASK = (1 << 32) - 1


class U64(NamedTuple):
    """A 64-bit unsigned integer as two uint32 words. A registered pytree."""

    hi: jax.Array
    lo: jax.Array


def from_int(value: int, shape: Sequence[int] = ()) -> U64:
    """Build a (broadcast) U64 from a Python integer constant."""
    value &= (1 << 64) - 1
    hi = jnp.full(shape, (value >> 32) & _U32_MASK, dtype=jnp.uint32)
    lo = jnp.full(shape, value & _U32_MASK, dtype=jnp.uint32)
    return U64(hi=hi, lo=lo)


def to_int(x: U64) -> int:
    """Convert a scalar U64 back to a Python int (host-side, for tests)."""
    return (int(x.hi) << 32) | int(x.lo)


def zeros(shape: Sequence[int] = ()) -> U64:
    return from_int(0, shape)


def land(a: U64, b: U64) -> U64:
    return U64(a.hi & b.hi, a.lo & b.lo)


def lor(a: U64, b: U64) -> U64:
    return U64(a.hi | b.hi, a.lo | b.lo)


def lxor(a: U64, b: U64) -> U64:
    return U64(a.hi ^ b.hi, a.lo ^ b.lo)


def lnot(a: U64) -> U64:
    return U64(~a.hi, ~a.lo)


def shl(a: U64, k: int) -> U64:
    """Logical shift left by a static amount 0 <= k < 32 (truncating at 64)."""
    if k == 0:
        return a
    assert 0 < k < 32, k
    hi = (a.hi << k) | (a.lo >> (32 - k))
    lo = a.lo << k
    return U64(hi, lo)


def shr(a: U64, k: int) -> U64:
    """Logical shift right by a static amount 0 <= k < 32."""
    if k == 0:
        return a
    assert 0 < k < 32, k
    lo = (a.lo >> k) | (a.hi << (32 - k))
    hi = a.hi >> k
    return U64(hi, lo)


def shift(a: U64, d: int) -> U64:
    """Signed shift: ``d > 0`` shifts left (toward bit 63), ``d < 0`` right."""
    return shl(a, d) if d >= 0 else shr(a, -d)


def is_zero(a: U64) -> jax.Array:
    return (a.hi | a.lo) == 0


def nonzero(a: U64) -> jax.Array:
    return (a.hi | a.lo) != 0


def eq(a: U64, b: U64) -> jax.Array:
    return (a.hi == b.hi) & (a.lo == b.lo)


def where(cond: jax.Array, a: U64, b: U64) -> U64:
    return U64(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def popcount(a: U64) -> jax.Array:
    """Number of set bits, as int32."""
    return (
        jax.lax.population_count(a.hi).astype(jnp.int32)
        + jax.lax.population_count(a.lo).astype(jnp.int32)
    )


def bit_at(index: jax.Array) -> U64:
    """Single set bit at dynamic position ``index`` in [0, 64).

    Mirrors ``1 << (row * 8 + col)`` from the reference board
    (/root/reference/src/game/board.py:170).
    """
    index = index.astype(jnp.uint32)
    in_lo = index < 32
    lo_shift = jnp.where(in_lo, index, 0)
    hi_shift = jnp.where(in_lo, 0, index - 32)
    one = jnp.uint32(1)
    lo = jnp.where(in_lo, one << lo_shift, jnp.uint32(0))
    hi = jnp.where(in_lo, jnp.uint32(0), one << hi_shift)
    return U64(hi, lo)


def get_bit(a: U64, index: jax.Array) -> jax.Array:
    """Value (bool) of bit ``index`` in [0, 64)."""
    index = index.astype(jnp.uint32)
    in_lo = index < 32
    word = jnp.where(in_lo, a.lo, a.hi)
    sh = jnp.where(in_lo, index, index - 32)
    return ((word >> sh) & 1).astype(jnp.bool_)


def to_board(a: U64) -> jax.Array:
    """Expand to an 8x8 bool board: ``out[..., r, c] = bit (r*8+c)``."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    lo_bits = (a.lo[..., None] >> shifts) & 1
    hi_bits = (a.hi[..., None] >> shifts) & 1
    bits = jnp.concatenate([lo_bits, hi_bits], axis=-1)
    return bits.reshape(*a.lo.shape, 8, 8).astype(jnp.bool_)


def from_board(board: jax.Array) -> U64:
    """Pack an ``[..., 8, 8]`` bool/0-1 board into a U64 (inverse of to_board)."""
    bits = board.reshape(*board.shape[:-2], 64).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    lo = jnp.sum(bits[..., :32] << shifts, axis=-1, dtype=jnp.uint32)
    hi = jnp.sum(bits[..., 32:] << shifts, axis=-1, dtype=jnp.uint32)
    return U64(hi, lo)
