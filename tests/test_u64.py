"""Property tests for the emulated uint64 ops against Python integers."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu.ops import u64

MASK64 = (1 << 64) - 1

random.seed(0)
SAMPLES = [random.getrandbits(64) for _ in range(50)] + [0, 1, MASK64, 1 << 63]


@pytest.mark.parametrize("a", SAMPLES[:10])
@pytest.mark.parametrize("b", SAMPLES[10:16])
def test_bitwise_ops(a, b):
    ua, ub = u64.from_int(a), u64.from_int(b)
    assert u64.to_int(u64.land(ua, ub)) == a & b
    assert u64.to_int(u64.lor(ua, ub)) == a | b
    assert u64.to_int(u64.lxor(ua, ub)) == a ^ b
    assert u64.to_int(u64.land(u64.lnot(ua), u64.from_int(MASK64))) == (~a) & MASK64


@pytest.mark.parametrize("a", SAMPLES[:12])
@pytest.mark.parametrize("k", [1, 7, 8, 9, 31])
def test_shifts(a, k):
    ua = u64.from_int(a)
    assert u64.to_int(u64.shl(ua, k)) == (a << k) & MASK64
    assert u64.to_int(u64.shr(ua, k)) == a >> k
    assert u64.to_int(u64.shift(ua, k)) == (a << k) & MASK64
    assert u64.to_int(u64.shift(ua, -k)) == a >> k


@pytest.mark.parametrize("a", SAMPLES)
def test_popcount(a):
    assert int(u64.popcount(u64.from_int(a))) == bin(a).count("1")


def test_bit_at_and_get_bit():
    for i in [0, 1, 31, 32, 63]:
        assert u64.to_int(u64.bit_at(jnp.int32(i))) == 1 << i
    a = u64.from_int(SAMPLES[3])
    for i in [0, 5, 31, 32, 40, 63]:
        assert bool(u64.get_bit(a, jnp.int32(i))) == bool(SAMPLES[3] >> i & 1)


@pytest.mark.parametrize("a", SAMPLES[:8])
def test_board_roundtrip(a):
    ua = u64.from_int(a)
    board = u64.to_board(ua)
    assert board.shape == (8, 8)
    # bit i = row*8 + col, LSB-first (board.py:49)
    expect = np.array([[bool(a >> (r * 8 + c) & 1) for c in range(8)]
                       for r in range(8)])
    np.testing.assert_array_equal(np.asarray(board), expect)
    assert u64.to_int(u64.from_board(board)) == a


def test_batched_shapes():
    batch = u64.from_int(0x123456789ABCDEF0, (4, 3))
    assert batch.hi.shape == (4, 3)
    assert u64.to_board(batch).shape == (4, 3, 8, 8)
    assert u64.popcount(batch).shape == (4, 3)
