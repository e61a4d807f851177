"""Device-resident replay buffer.

The reference has no replay buffer at all — each iteration trains only on the
games it just generated (/root/reference/src/trainer/pipeline.py:152-270 packs
the current iteration's games straight into a DataLoader; self-play games are
saved to disk but never re-read, SURVEY.md §5 checkpoint notes). A replay
buffer over the last ``capacity`` positions is the standard AlphaZero design;
``TrainingConfig.train_on_latest_only`` restores the reference's behavior by
clearing the buffer each iteration.

TPU-first layout: one pytree of fixed-shape arrays living in HBM, updated by
jitted scatter ops (ring insert) and sampled by jitted gather — the host never
touches the data between self-play and SGD. Planes are stored as ``int8``
(they are 0/1 masks) — 4x less HBM than float32 — and cast on sample.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ReplayBuffer(NamedTuple):
    """Ring buffer of training positions. Capacity = leading dim."""

    planes: jax.Array  # [C, 8, 8, 3] int8
    policy: jax.Array  # [C, 65] f32
    value: jax.Array  # [C] f32
    cursor: jax.Array  # scalar i32 — next write slot
    size: jax.Array  # scalar i32 — filled slots (<= C)


def create(capacity: int, board_size: int = 8,
           num_actions: int = 65) -> ReplayBuffer:
    return ReplayBuffer(
        planes=jnp.zeros((capacity, board_size, board_size, 3), jnp.int8),
        policy=jnp.zeros((capacity, num_actions), jnp.float32),
        value=jnp.zeros((capacity,), jnp.float32),
        cursor=jnp.int32(0),
        size=jnp.int32(0),
    )


@jax.jit
def add(buffer: ReplayBuffer, planes: jax.Array, policy: jax.Array,
        value: jax.Array, valid: jax.Array) -> ReplayBuffer:
    """Ring-insert the ``valid`` rows of a flat batch.

    Invalid rows (self-play padding, see ``selfplay.flatten_trajectory``) are
    scattered to index ``capacity`` with ``mode='drop'`` — XLA discards them;
    the shapes stay static.
    """
    capacity = buffer.value.shape[0]
    valid = valid.astype(jnp.int32)
    offsets = jnp.cumsum(valid) - 1  # position among valid rows
    dest = (buffer.cursor + offsets) % capacity
    dest = jnp.where(valid == 1, dest, capacity)  # dropped by mode='drop'
    n = valid.sum()
    return ReplayBuffer(
        planes=buffer.planes.at[dest].set(planes.astype(jnp.int8),
                                          mode="drop"),
        policy=buffer.policy.at[dest].set(policy, mode="drop"),
        value=buffer.value.at[dest].set(value, mode="drop"),
        cursor=(buffer.cursor + n) % capacity,
        size=jnp.minimum(buffer.size + n, capacity),
    )


@functools.partial(jax.jit, static_argnames=("batch_size",))
def sample(buffer: ReplayBuffer, key: jax.Array, batch_size: int
           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Uniform sample with replacement -> (planes f32, policy, value)."""
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(buffer.size, 1))
    return (
        buffer.planes[idx].astype(jnp.float32),
        buffer.policy[idx],
        buffer.value[idx],
    )


def reset(buffer: ReplayBuffer) -> ReplayBuffer:
    """Empty the buffer (used by ``train_on_latest_only``)."""
    return buffer._replace(cursor=jnp.int32(0), size=jnp.int32(0))
