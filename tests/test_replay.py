"""Replay buffer ring/masking semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_reversi_tpu import replay


def _batch(n, base=0.0):
    planes = jnp.ones((n, 8, 8, 3), jnp.float32)
    policy = jnp.tile(jnp.arange(n, dtype=jnp.float32)[:, None] + base,
                      (1, 65))
    value = jnp.arange(n, dtype=jnp.float32) + base
    return planes, policy, value


def test_masked_insert_skips_padding():
    buf = replay.create(16)
    planes, policy, value = _batch(6)
    valid = jnp.array([True, False, True, True, False, True])
    buf = replay.add(buf, planes, policy, value, valid)
    assert int(buf.size) == 4
    assert int(buf.cursor) == 4
    np.testing.assert_array_equal(np.asarray(buf.value[:4]),
                                  [0.0, 2.0, 3.0, 5.0])


def test_ring_wraparound():
    buf = replay.create(8)
    for i in range(3):
        planes, policy, value = _batch(5, base=10.0 * i)
        buf = replay.add(buf, planes, policy, value,
                         jnp.ones(5, dtype=bool))
    assert int(buf.size) == 8
    assert int(buf.cursor) == 15 % 8
    # last 8 values written, in ring order
    vals = np.asarray(buf.value)
    expect = np.zeros(8)
    seq = [0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 20, 21, 22, 23, 24]
    for pos, v in enumerate(seq):
        expect[pos % 8] = v
    np.testing.assert_array_equal(vals, expect)


def test_sample_in_range_and_dtype():
    buf = replay.create(32)
    planes, policy, value = _batch(10)
    buf = replay.add(buf, planes, policy, value, jnp.ones(10, dtype=bool))
    p, pol, v = replay.sample(buf, jax.random.PRNGKey(0), 64)
    assert p.dtype == jnp.float32 and p.shape == (64, 8, 8, 3)
    assert (np.asarray(v) >= 0).all() and (np.asarray(v) <= 9).all()


def test_reset():
    buf = replay.create(8)
    planes, policy, value = _batch(4)
    buf = replay.add(buf, planes, policy, value, jnp.ones(4, dtype=bool))
    buf = replay.reset(buf)
    assert int(buf.size) == 0 and int(buf.cursor) == 0
