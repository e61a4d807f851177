"""Batched on-device arena: head-to-head evaluation and round-robin ELO
tournaments.

Replaces ``Arena`` / ``ELOPlayer`` (/root/reference/src/arena/arena.py:138-409).
The reference plays one game at a time on the host, with a fresh Python MCTS
per player per move; here a whole pairing's games run **batched in one jitted
program** — colors alternated across the batch, both players' searches
evaluated as full-batch MXU forwards each move slot, the mover's distribution
selected per game with a ``where``. ELO bookkeeping stays host-side
(``elo.ELORatingSystem``), updated per game as the reference does
(arena.py:347).

Divergence (documented): ``ELOPlayer.get_move`` hard-codes ``temperature=1.0``
(arena.py:185), silently ignoring the 0.1 the pipeline passes
(pipeline.py:391). Here the configured tournament temperature is honored.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import TournamentConfig
from .elo import ELORatingSystem
from .env import bitboard as env
from .mcts import search as search_lib


class Player(NamedTuple):
    """A tournament participant: a model (variables) or the random baseline
    (``variables=None`` — arena.py:177-180)."""

    name: str
    variables: Optional[Dict[str, Any]] = None


def _random_probs(states: env.EnvState, compat: bool) -> jax.Array:
    """Uniform distribution over legal actions (the random baseline,
    arena.py:179-180)."""
    legal = env.legal_action_mask(states, compat=compat).astype(jnp.float32)
    return legal / jnp.maximum(legal.sum(axis=-1, keepdims=True), 1e-9)


@functools.partial(
    jax.jit,
    static_argnames=("net", "num_games", "num_simulations", "max_depth",
                     "max_moves", "compat", "a_random", "b_random"),
)
def play_pair(net, vars_a, vars_b, key: jax.Array, *, num_games: int,
              num_simulations: int, c_puct: float, temperature: float,
              max_depth: int = 64, max_moves: int = 60, compat: bool = False,
              a_random: bool = False, b_random: bool = False) -> jax.Array:
    """Play ``num_games`` games of A vs B in lockstep.

    A plays BLACK in even-indexed games and WHITE in odd ones (the batched
    form of the reference's per-round color alternation, arena.py:339-341).
    Returns ``score_a`` per game: 1.0 win / 0.5 draw / 0.0 loss
    (arena.py:264-270 scoring).
    """
    a_color = jnp.where(jnp.arange(num_games) % 2 == 0, env.BLACK,
                        env.WHITE).astype(jnp.int32)
    states = env.initial_state((num_games,))

    def side_probs(states, skey, variables, is_random: bool) -> jax.Array:
        if is_random:
            return _random_probs(states, compat)
        result = search_lib.run_search(
            net, variables, states, skey,
            num_simulations=num_simulations, c_puct=c_puct,
            dirichlet_alpha=0.3, dirichlet_epsilon=0.0,
            max_depth=max_depth, compat=compat, add_noise=False)
        return search_lib.probs_with_temperature(
            result.visit_counts, jnp.float32(temperature))

    def move_step(states, step_key):
        ka, kb, ks = jax.random.split(step_key, 3)
        probs_a = side_probs(states, ka, vars_a, a_random)
        probs_b = side_probs(states, kb, vars_b, b_random)
        mover_is_a = (states.to_move == a_color)[:, None]
        probs = jnp.where(mover_is_a, probs_a, probs_b)
        actions = search_lib.sample_actions(ks, probs)
        new_states, _ = env.step(states, actions, compat=compat)
        new_states = jax.tree_util.tree_map(
            lambda new, old: jnp.where(states.done, old, new),
            new_states, states)
        return new_states, None

    step_keys = jax.random.split(key, max_moves)
    final, _ = jax.lax.scan(move_step, states, step_keys)

    nb, nw = env.score(final)
    count_winner = jnp.where(nb > nw, env.BLACK,
                             jnp.where(nw > nb, env.WHITE, 0)).astype(jnp.int32)
    winner = jnp.where(final.done, final.winner, count_winner)
    return jnp.where(winner == a_color, 1.0,
                     jnp.where(winner == 0, 0.5, 0.0)).astype(jnp.float32)


class Arena:
    """Round-robin tournament league (arena.py:200-409)."""

    def __init__(self, net, config: TournamentConfig, compat: bool = False):
        self.net = net
        self.config = config
        self.compat = compat
        self.elo = ELORatingSystem(k=config.elo_k_factor,
                                   initial_rating=config.elo_initial)
        self.players: List[Player] = []

    def add_player(self, name: str,
                   variables: Optional[Dict[str, Any]] = None,
                   rating: Optional[float] = None) -> None:
        self.players.append(Player(name=name, variables=variables))
        self.elo.add_player(name, rating)

    def play_games(self, a: Player, b: Player, key: jax.Array,
                   num_games: int) -> np.ndarray:
        """Batched A-vs-B match; returns per-game scores for A."""
        cfg = self.config
        scores = play_pair(
            self.net, a.variables, b.variables, key,
            num_games=num_games,
            num_simulations=cfg.num_simulations,
            c_puct=cfg.c_puct,
            temperature=cfg.temperature,
            compat=self.compat,
            a_random=a.variables is None,
            b_random=b.variables is None)
        return np.asarray(scores)

    def run_tournament(self, key: jax.Array,
                       rounds: Optional[int] = None) -> List[Dict]:
        """Every pair plays ``games_per_pair`` games per round; first mover
        alternates by ``(i + j + round) % 2`` (arena.py:339-341). Per-game
        ELO updates, as the reference does (arena.py:347)."""
        rounds = rounds if rounds is not None else self.config.rounds
        n = len(self.players)
        for round_num in range(rounds):
            for i in range(n):
                for j in range(i + 1, n):
                    if (i + j + round_num) % 2 == 0:
                        first, second = self.players[i], self.players[j]
                    else:
                        first, second = self.players[j], self.players[i]
                    key, match_key = jax.random.split(key)
                    scores = self.play_games(first, second, match_key,
                                             self.config.games_per_pair)
                    for s in scores:
                        self.elo.update_ratings(first.name, second.name,
                                                float(s))
        return self.elo.get_leaderboard()

    def save_results(self, filepath: str) -> None:
        """Persist ELO state (arena.py:401-409)."""
        self.elo.save_ratings(filepath)
