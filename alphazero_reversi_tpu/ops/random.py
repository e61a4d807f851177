"""Collective-free random samplers for SPMD programs.

``jax.random.gamma`` (and therefore ``jax.random.dirichlet``) lowers to a
rejection-sampling ``while_loop`` whose continuation predicate reduces over
the whole batch. Under GSPMD with the batch sharded over a mesh, that
predicate becomes a per-round ``all-reduce`` — the ONLY collective in the
otherwise communication-free sharded self-play program
(``parallel.dp.sharded_play_games``), and a needless sync point at pod
scale. This module replaces the data-dependent loop with a **fixed trial
count**: draw ``iters`` Marsaglia-Tsang candidates per element up front,
take the first accepted one (an argmax over the trial axis — elementwise
with respect to the batch, so no cross-shard reduction exists anywhere).

Acceptance per trial is >= 0.95 for shape >= 1 (Marsaglia & Tsang 2000),
so with the default 8 trials the per-element fallback probability is
~0.05^8 ≈ 4e-11 — statistically invisible next to the exploration noise
this feeds (AlphaZero root Dirichlet, search.py).

Sampling happens in LOG space: Dirichlet noise only needs gamma *ratios*,
and for the tiny concentrations AlphaZero uses (alpha ~ 0.03) the shape<1
boost ``g * u**(1/alpha)`` underflows float32 — ``log g + log(u)/alpha``
followed by a masked softmax does not.

No reference analog (the reference draws np.random.dirichlet on the host
per move, src/mcts/mcts.py); this is TPU-first infrastructure.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sample_log_gamma(key: jax.Array, alpha, shape: tuple,
                     dtype=jnp.float32, iters: int = 8) -> jax.Array:
    """log of Gamma(alpha, 1) samples, collective-free (fixed trial count).

    ``alpha`` may be a Python float or a traced scalar (it is a plain
    traced argument of ``play_games``). The shape-boost identity
    ``Gamma(a) = Gamma(a+1) * U^(1/a)`` (valid for every a > 0) is applied
    unconditionally so the sampler contains no Python branch on ``alpha``:
    Marsaglia-Tsang candidates are drawn at shape ``alpha + 1 >= 1``, where
    per-trial acceptance is >= 0.95. Returns ``log(g)``, ``g ~ Gamma(alpha)``.
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    a = alpha + 1.0
    d = a - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    kx, ku, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (iters,) + tuple(shape), jnp.float32)
    u = jax.random.uniform(ku, (iters,) + tuple(shape), jnp.float32,
                           minval=1e-12)
    v = (1.0 + c * x) ** 3
    # squeeze step: accept when v > 0 and log u < x^2/2 + d - d v + d log v
    ok = (v > 0.0) & (jnp.log(u) <
                      0.5 * x * x + d - d * v
                      + d * jnp.log(jnp.where(v > 0.0, v, 1.0)))
    # first accepted trial per element (argmax of bool = first True);
    # reduction is over the TRIAL axis only — elementwise in the batch
    idx = jnp.argmax(ok, axis=0)
    v_pick = jnp.take_along_axis(v, idx[None], axis=0)[0]
    # fallback (prob ~0.05^iters): v=1, i.e. g = d (near the mode)
    v_pick = jnp.where(ok.any(axis=0), v_pick, 1.0)
    # Gamma(alpha) = Gamma(alpha+1) * U^(1/alpha), applied in log space
    ub = jax.random.uniform(kb, tuple(shape), jnp.float32, minval=1e-12)
    log_g = jnp.log(d) + jnp.log(v_pick) + jnp.log(ub) / alpha
    return log_g.astype(dtype)


def dirichlet_noise(key: jax.Array, alpha: float, legal: jax.Array,
                    dtype=jnp.float32, iters: int = 8) -> jax.Array:
    """Dirichlet(alpha) draw over the legal actions of each row:
    a masked softmax of log-gamma samples (zero where illegal, rows sum
    to 1). ``legal`` is a boolean ``[..., A]`` mask."""
    log_g = sample_log_gamma(key, alpha, legal.shape, jnp.float32,
                             iters=iters)
    log_g = jnp.where(legal, log_g, -jnp.inf)
    noise = jax.nn.softmax(log_g, axis=-1)
    # rows with no legal action (done states fed through the search) get 0
    return jnp.where(legal, noise, 0.0).astype(dtype)
