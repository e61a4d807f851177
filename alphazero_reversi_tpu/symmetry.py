"""Dihedral-8 board symmetries: training-data augmentation.

The reference carried symmetry machinery that could never run: its
transposition table probed ``get_symmetry_hashes`` for the 8 dihedral
variants of a position (/root/reference/src/mcts/mcts.py:369-383), but no
hash provider exists anywhere, so every lookup short-circuited (SURVEY.md
§2.1 "Transposition table (dead)"). This module is the living replacement,
applied where symmetries actually pay on TPU: **augmenting training
samples**. Each sampled position is transformed by a random element of the
dihedral group D4 (4 rotations x optional reflection) — pure gather work on
``[B, 64]`` index arrays, fused into the jitted train step, no host code.

Octagonal-symmetry caveat: augmentation assumes the game's rules are
equivariant under D4. That holds for *correct* Othello (tested against the
env in tests/test_symmetry.py) but NOT for ``compat`` mode — the
reference's edge-wrap/mis-masked-flip quirks (SURVEY.md §2.5) single out
the east/west directions. Augmentation is therefore an opt-in
(``TrainingConfig.augment_symmetries``), off by default so the default
pipeline stays semantics-matched to the reference.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

NUM_SYMS = 8

def _build_perms() -> np.ndarray:
    """``PERMS[s, i] = j``: output cell ``i`` of symmetry ``s`` reads input
    cell ``j``. Cell index = row * 8 + col (the env's LSB-first order,
    env/bitboard.py). Symmetries: s = 4 * flip + k == fliplr^flip then
    rot90^k applied to the 8x8 index grid."""
    idx = np.arange(64).reshape(8, 8)
    mats = []
    for flip in (False, True):
        base = np.fliplr(idx) if flip else idx
        for k in range(4):
            mats.append(np.rot90(base, k))
    return np.stack([m.reshape(64) for m in mats]).astype(np.int32)


PERMS = _build_perms()  # [8, 64]

# INVERSE[s] = s' with perm[s'] o perm[s] == identity
INVERSE = np.asarray(
    [int(np.nonzero([np.array_equal(PERMS[t][PERMS[s]], np.arange(64))
                     for t in range(NUM_SYMS)])[0][0])
     for s in range(NUM_SYMS)], dtype=np.int32)


def apply_to_planes(planes: jax.Array, sym: jax.Array) -> jax.Array:
    """Transform NN input planes ``[B, 8, 8, C]`` by per-sample symmetry
    ``sym`` ``[B]`` in [0, 8)."""
    b = planes.shape[0]
    c = planes.shape[-1]
    flat = planes.reshape(b, 64, c)
    perm = jnp.asarray(PERMS)[sym]  # [B, 64]
    out = jnp.take_along_axis(flat, perm[..., None], axis=1)
    return out.reshape(b, 8, 8, c)


def apply_to_policy(policy: jax.Array, sym: jax.Array) -> jax.Array:
    """Transform a 65-way policy vector ``[B, 65]`` (64 squares + pass;
    pass is symmetry-invariant) by per-sample symmetry ``sym`` ``[B]``."""
    perm = jnp.asarray(PERMS)[sym]
    board = jnp.take_along_axis(policy[:, :64], perm, axis=1)
    return jnp.concatenate([board, policy[:, 64:]], axis=1)


def apply_to_mask(mask: jax.Array, sym: jax.Array) -> jax.Array:
    """Transform a boolean/int cell mask ``[B, 64]``."""
    perm = jnp.asarray(PERMS)[sym]
    return jnp.take_along_axis(mask, perm, axis=1)


def random_syms(key: jax.Array, batch: int) -> jax.Array:
    return jax.random.randint(key, (batch,), 0, NUM_SYMS, dtype=jnp.int32)


def augment(key: jax.Array, planes: jax.Array, policy: jax.Array
            ) -> tuple[jax.Array, jax.Array]:
    """Random per-sample dihedral transform of (planes, policy targets)."""
    sym = random_syms(key, planes.shape[0])
    return apply_to_planes(planes, sym), apply_to_policy(policy, sym)
