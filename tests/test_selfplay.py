"""Self-play integrity tests — the coverage the reference never had
(SURVEY.md §4: "Nothing tests ... self-play data integrity")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu import selfplay
from alphazero_reversi_tpu.config import MCTSConfig, ModelConfig, SelfPlayConfig
from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.models import resnet

GAMES = 4
SIMS = 12


@pytest.fixture(scope="module")
def net_and_vars():
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      value_head_hidden_size=16, compute_dtype="float32")
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    return net, variables


@pytest.fixture(scope="module")
def traj(net_and_vars):
    net, variables = net_and_vars
    sp = selfplay.SelfPlay(
        net, variables,
        MCTSConfig(num_simulations=SIMS, max_depth=64),
        SelfPlayConfig(num_parallel_games=GAMES, temp_threshold=6,
                       temp_init=1.0, temp_final=0.1, max_moves=60),
    )
    return jax.tree_util.tree_map(
        np.asarray, sp.generate_games(jax.random.PRNGKey(7)))


def test_shapes(traj):
    t, b = traj.valid.shape
    assert (t, b) == (60, GAMES)
    assert traj.planes.shape == (t, b, 8, 8, 3)
    assert traj.policy.shape == (t, b, 65)
    assert traj.value.shape == (t, b)
    assert traj.actions.shape == (t, b)


def test_all_games_terminate(traj):
    # 60 placement slots always suffice on 8x8 (one stone per live move).
    assert traj.final_state.done.all()


def test_valid_mask_monotone(traj):
    # once a game finishes, every later slot is padding
    v = traj.valid.astype(np.int8)
    assert ((np.diff(v, axis=0) <= 0)).all()
    # every game has at least the 4 forced opening moves
    assert (v.sum(axis=0) >= 4).all()


def test_policy_targets_are_distributions(traj):
    valid = traj.valid
    sums = traj.policy.sum(axis=-1)
    np.testing.assert_allclose(sums[valid], 1.0, atol=1e-4)
    assert (traj.policy >= 0).all()


def test_values_match_final_outcome(traj):
    # value is the game outcome from the recorded mover's perspective
    for b in range(GAMES):
        final = jax.tree_util.tree_map(lambda x: x[b], traj.final_state)
        winner = int(final.winner)
        for t in range(60):
            if not traj.valid[t, b]:
                assert traj.value[t, b] == 0.0
                continue
            mover = int(traj.to_move[t, b])
            expect = 0.0 if winner == 0 else (1.0 if winner == mover else -1.0)
            assert traj.value[t, b] == expect


def test_actions_were_legal_and_grow_board(traj):
    """Replay the recorded actions through the env: every recorded action
    must be legal at its recorded position and add exactly one stone."""
    states = env.initial_state((GAMES,))
    for t in range(60):
        live = np.asarray(states.done) == False  # noqa: E712
        np.testing.assert_array_equal(np.asarray(traj.valid[t]), live)
        acts = jnp.asarray(traj.actions[t])
        before = np.asarray(env.score(states)[0] + env.score(states)[1])
        legal = np.asarray(env.legal_action_mask(states))
        for b in range(GAMES):
            if live[b]:
                assert legal[b, traj.actions[t, b]], (t, b)
        states, valid = env.step(states, jnp.maximum(acts, 0))
        after = np.asarray(env.score(states)[0] + env.score(states)[1])
        assert (after[live] == before[live] + 1).all()
    np.testing.assert_array_equal(
        np.asarray(states.black.lo), np.asarray(traj.final_state.black.lo))
    np.testing.assert_array_equal(
        np.asarray(states.white.hi), np.asarray(traj.final_state.white.hi))


def test_deterministic_given_key(net_and_vars):
    net, variables = net_and_vars
    kwargs = dict(num_games=2, num_simulations=8, c_puct=1.0,
                  dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                  temp_threshold=4, temp_init=1.0, temp_final=0.1,
                  max_moves=60)
    a = selfplay.play_games(net, variables, jax.random.PRNGKey(3), **kwargs)
    b = selfplay.play_games(net, variables, jax.random.PRNGKey(3), **kwargs)
    np.testing.assert_array_equal(np.asarray(a.actions), np.asarray(b.actions))
    np.testing.assert_array_equal(np.asarray(a.value), np.asarray(b.value))


def test_flatten_masks_padding(traj):
    planes, policy, value, valid = selfplay.flatten_trajectory(
        jax.tree_util.tree_map(jnp.asarray, traj))
    assert planes.shape[0] == 60 * GAMES
    assert int(valid.sum()) == int(traj.valid.sum())


def test_tail_slots_beyond_game_end_are_skipped(net_and_vars):
    """With max_moves beyond every game's length, the all-done tail slots
    (served by the lax.cond dead branch — no search) are pure padding and
    the shared prefix is bit-identical to the max_moves=60 run."""
    net, variables = net_and_vars
    kwargs = dict(num_games=2, num_simulations=8, c_puct=1.0,
                  dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                  temp_threshold=4, temp_init=1.0, temp_final=0.1)
    short = selfplay.play_games(net, variables, jax.random.PRNGKey(3),
                                max_moves=60, **kwargs)
    # same per-slot key stream for the first 60 slots requires the same
    # split count; play_games splits once per slot, so compare runs whose
    # prefixes share the fold-in structure: key splits are derived from the
    # SAME top-level key independent of max_moves.
    long = selfplay.play_games(net, variables, jax.random.PRNGKey(3),
                               max_moves=66, **kwargs)
    assert bool(np.asarray(long.final_state.done).all())
    # all 6 extra slots lie beyond every game's end: padding only
    tail_valid = np.asarray(long.valid)[60:]
    assert not tail_valid.any()
    assert (np.asarray(long.actions)[60:] == -1).all()
    np.testing.assert_array_equal(np.asarray(long.final_state.black.lo),
                                  np.asarray(short.final_state.black.lo))
    np.testing.assert_array_equal(np.asarray(long.final_state.white.lo),
                                  np.asarray(short.final_state.white.lo))
