"""Gumbel sequential-halving search tests (mcts/gumbel.py).

No reference counterpart (the reference implements PUCT only) — the
invariants are the paper's: the halving schedule is honored exactly, the
improved policy is a legal distribution, evaluation play is deterministic
at gumbel_scale=0, and mate-in-1 positions are solved at tiny budgets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu.config import MCTSConfig, ModelConfig
from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.mcts import gumbel
from alphazero_reversi_tpu.mcts import search as mcts_search
from alphazero_reversi_tpu.mcts import tree as tree_lib
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.ops import u64

B = 4


@pytest.fixture(scope="module")
def net_and_vars():
    net = resnet.build_network(
        ModelConfig(num_res_blocks=1, num_filters=8, compute_dtype="float32"))
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    return net, variables


def test_halving_schedule_hand_cases():
    # m=4, n=8: phase 1 visits all 4 once; phase 2 gives the top 2 two more
    assert gumbel.halving_schedule(4, 8) == (0, 0, 0, 0, 1, 1, 2, 2)
    # m=16, n=32: 16 at count 0, top-8 once more, top-4 twice more
    assert gumbel.halving_schedule(16, 32) == tuple(
        [0] * 16 + [1] * 8 + [2] * 4 + [3] * 4)
    # single candidate: every simulation revisits it
    assert gumbel.halving_schedule(1, 5) == (0, 1, 2, 3, 4)


def test_halving_schedule_properties():
    for m in (2, 3, 5, 16, 65):
        for n in (1, 7, 32, 100):
            seq = gumbel.halving_schedule(m, n)
            assert len(seq) == n
            assert all(b >= a for a, b in zip(seq, seq[1:])), "nondecreasing"
            assert seq[0] == 0


def test_schedule_table_rows():
    table = gumbel.schedule_table(8, 16)
    assert table.shape == (9, 16)
    # row m is the m-candidate schedule (row 0 degenerates to row 1)
    np.testing.assert_array_equal(table[4], gumbel.halving_schedule(4, 16))
    np.testing.assert_array_equal(table[0], table[1])


@pytest.fixture(scope="module")
def opening_result(net_and_vars):
    net, variables = net_and_vars
    roots = env.initial_state((B,))
    return gumbel.run_gumbel_search(
        net, variables, roots, jax.random.PRNGKey(1),
        num_simulations=8, max_considered_actions=4, max_depth=16)


def test_gumbel_visit_conservation(opening_result):
    np.testing.assert_array_equal(
        np.asarray(opening_result.visit_counts.sum(-1)), 8)
    np.testing.assert_array_equal(
        np.asarray(opening_result.tree.root_visit), 8)


def test_gumbel_halving_counts_at_opening(opening_result):
    """The opening has exactly 4 legal moves; with m=4, n=8 the schedule
    forces the visit multiset {3, 3, 1, 1} in every game."""
    counts = np.asarray(opening_result.visit_counts)
    for b in range(B):
        assert sorted(counts[b][counts[b] > 0].tolist()) == [1, 1, 3, 3]


def test_gumbel_legality(opening_result):
    roots = env.initial_state((B,))
    legal = np.asarray(env.legal_action_mask(roots))
    counts = np.asarray(opening_result.visit_counts)
    assert (counts[~legal] == 0).all()
    probs = np.asarray(opening_result.action_probs)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert (probs[~legal] == 0).all()
    chosen = np.asarray(opening_result.chosen_action)
    assert legal[np.arange(B), chosen].all()


def test_gumbel_chosen_is_max_visited(opening_result):
    """The halving winner sits among the final prescribed-count survivors —
    i.e. the maximally visited root actions."""
    counts = np.asarray(opening_result.visit_counts)
    chosen = np.asarray(opening_result.chosen_action)
    for b in range(B):
        assert counts[b, chosen[b]] == counts[b].max()


def test_gumbel_deterministic_at_scale_zero(net_and_vars):
    net, variables = net_and_vars
    roots = env.initial_state((2,))
    kwargs = dict(num_simulations=8, max_considered_actions=4, max_depth=8,
                  gumbel_scale=0.0)
    r1 = gumbel.run_gumbel_search(net, variables, roots,
                                  jax.random.PRNGKey(1), **kwargs)
    r2 = gumbel.run_gumbel_search(net, variables, roots,
                                  jax.random.PRNGKey(2), **kwargs)
    np.testing.assert_array_equal(np.asarray(r1.chosen_action),
                                  np.asarray(r2.chosen_action))
    np.testing.assert_array_equal(np.asarray(r1.visit_counts),
                                  np.asarray(r2.visit_counts))


def test_gumbel_noise_varies_with_key(net_and_vars):
    """With gumbel_scale=1 the candidate ordering (hence visits) depends on
    the key — the Gumbel draw is the self-play exploration."""
    net, variables = net_and_vars
    roots = env.initial_state((8,))
    kwargs = dict(num_simulations=8, max_considered_actions=4, max_depth=8)
    r1 = gumbel.run_gumbel_search(net, variables, roots,
                                  jax.random.PRNGKey(1), **kwargs)
    r2 = gumbel.run_gumbel_search(net, variables, roots,
                                  jax.random.PRNGKey(2), **kwargs)
    assert not np.array_equal(np.asarray(r1.visit_counts),
                              np.asarray(r2.visit_counts))


def test_gumbel_finds_winning_move(net_and_vars):
    """Mate-in-1 at a tiny budget: (0,0) is the only legal move and wins."""
    net, variables = net_and_vars
    black = 0
    white = 1 << 1
    for i in range(2, 64):
        black |= 1 << i
    state = env.initial_state((1,))._replace(
        black=u64.from_int(black, (1,)), white=u64.from_int(white, (1,)))
    res = gumbel.run_gumbel_search(
        net, variables, state, jax.random.PRNGKey(0),
        num_simulations=8, max_considered_actions=4, max_depth=16)
    assert int(np.asarray(res.chosen_action)[0]) == 0
    assert int(np.asarray(res.visit_counts)[0, 0]) == 8
    np.testing.assert_allclose(np.asarray(res.root_value), [1.0], atol=1e-6)


def test_gumbel_terminal_root(net_and_vars):
    """A finished game neither crashes nor expands nodes."""
    net, variables = net_and_vars
    done_state = env.initial_state((2,))._replace(
        done=jnp.ones(2, jnp.bool_), winner=jnp.array([1, 2], jnp.int32))
    res = gumbel.run_gumbel_search(
        net, variables, done_state, jax.random.PRNGKey(0),
        num_simulations=4, max_considered_actions=4, max_depth=8)
    assert (np.asarray(res.visit_counts) == 0).all()
    assert (np.asarray(tree_lib.num_linked_nodes(res.tree)) == 1).all()


def test_gumbel_leaf_batch_invariants(net_and_vars):
    """Multi-leaf rounds consume schedule entries in order: totals and the
    halving multiset are preserved (in-round picks count toward the
    prescribed-visit mask)."""
    net, variables = net_and_vars
    roots = env.initial_state((B,))
    res = gumbel.run_gumbel_search(
        net, variables, roots, jax.random.PRNGKey(1),
        num_simulations=8, max_considered_actions=4, max_depth=16,
        leaf_batch=4)
    counts = np.asarray(res.visit_counts)
    np.testing.assert_array_equal(counts.sum(-1), 8)
    for b in range(B):
        assert sorted(counts[b][counts[b] > 0].tolist()) == [1, 1, 3, 3]


def test_gumbel_mcts_wrapper(net_and_vars):
    net, variables = net_and_vars
    cfg = MCTSConfig(num_simulations=8, max_depth=8, algorithm="gumbel",
                     max_considered_actions=4)
    m = mcts_search.MCTS(net, variables, cfg)
    roots = env.initial_state((2,))
    probs, result = m.get_action_probs(roots, jax.random.PRNGKey(0),
                                       temperature=0.0, add_noise=False)
    p = np.asarray(probs)
    chosen = np.asarray(result.chosen_action)
    np.testing.assert_allclose(p[np.arange(2), chosen], 1.0)
    probs1, _ = m.get_action_probs(roots, jax.random.PRNGKey(0),
                                   temperature=1.0, add_noise=False)
    np.testing.assert_allclose(np.asarray(probs1).sum(-1), 1.0, rtol=1e-5)


def test_gumbel_pipeline_end_to_end(tmp_path):
    """One full training iteration with algorithm="gumbel": self-play
    records improved-policy targets, the learner trains on them, and the
    gumbel arena evaluates."""
    from alphazero_reversi_tpu.config import (
        Config, LoggingConfig, MeshConfig, SelfPlayConfig, TournamentConfig,
        TrainingConfig)
    from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline

    cfg = Config(
        seed=1,
        model=ModelConfig(num_res_blocks=1, num_filters=8,
                          value_head_hidden_size=16,
                          compute_dtype="float32"),
        mcts=MCTSConfig(num_simulations=8, max_depth=8, algorithm="gumbel",
                        max_considered_actions=4),
        self_play=SelfPlayConfig(num_games=2, num_parallel_games=2,
                                 max_moves=8, save_every=0,
                                 save_dir=str(tmp_path / "sp")),
        training=TrainingConfig(batch_size=16, num_epochs=1,
                                replay_capacity=256,
                                checkpoint_dir=str(tmp_path / "ckpt")),
        tournament=TournamentConfig(rounds=1, num_simulations=4,
                                    games_per_pair=2, algorithm="gumbel"),
        logging=LoggingConfig(log_dir=str(tmp_path / "logs"),
                              use_tensorboard=False, verbose=False),
        mesh=MeshConfig(data_axis=1),
    )
    pipe = AlphaZeroPipeline(cfg, run_name="gumbel_e2e")
    pipe.train()
    assert pipe.iteration == 1
    loss = float(pipe.metrics_history[0]["train/loss"])
    assert loss == loss  # non-NaN


def test_completed_q_sigma_ordering():
    """sigma preserves Q ordering among visited actions, completes unvisited
    ones with the mixed value, and zeroes illegal actions."""
    visits = jnp.array([[2.0, 1.0, 0.0, 0.0]])
    vsum = jnp.array([[1.6, -0.4, 0.0, 0.0]])  # q = 0.8, -0.4
    prior = jnp.array([[0.4, 0.3, 0.2, 0.1]])
    legal = jnp.array([[True, True, True, False]])
    raw_value = jnp.array([0.5])
    sig = np.asarray(gumbel.completed_q_sigma(
        visits, vsum, prior, legal, raw_value, 50.0, 0.1))
    assert sig[0, 0] > sig[0, 1]  # higher q -> higher sigma
    assert sig[0, 3] == 0.0  # illegal zeroed
    # unvisited completion sits between the extremes (mixed value)
    assert sig[0, 1] <= sig[0, 2] <= sig[0, 0]


def test_gumbel_mcts_uses_transposition_table(net_and_vars):
    """algorithm='gumbel' MCTS consults the TT for deterministic batch-1
    queries: second identical query is a hit with an identical result, and
    noisy (gumbel_scale>0) queries bypass the table."""
    from alphazero_reversi_tpu.mcts.transposition import TranspositionTable

    net, variables = net_and_vars
    tt = TranspositionTable()
    cfg = MCTSConfig(num_simulations=8, max_depth=4, algorithm="gumbel",
                     max_considered_actions=4)
    mcts = mcts_search.MCTS(net, variables, cfg, transposition_table=tt)
    states = env.initial_state((1,))

    p1, r1 = mcts.get_action_probs(states, jax.random.PRNGKey(1),
                                   add_noise=False)
    assert tt.misses == 1 and tt.hits == 0 and len(tt) == 1
    p2, r2 = mcts.get_action_probs(states, jax.random.PRNGKey(2),
                                   add_noise=False)
    assert tt.hits == 1
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert int(r1.chosen_action[0]) == int(r2.chosen_action[0])
    assert np.allclose(np.asarray(r1.action_probs),
                       np.asarray(r2.action_probs))
    assert np.array_equal(np.asarray(r1.visit_counts),
                          np.asarray(r2.visit_counts))

    # noised queries (a fresh Gumbel draw) are not cacheable
    mcts.get_action_probs(states, jax.random.PRNGKey(3), add_noise=True)
    assert tt.hits == 1 and len(tt) == 1


def test_play_probs_blend(net_and_vars):
    """gumbel.play_probs: ~zero temperature plays the halving winner
    one-hot; higher temperatures temper the improved policy."""
    net, variables = net_and_vars
    states = env.initial_state((B,))
    res = gumbel.run_gumbel_search(
        net, variables, states, jax.random.PRNGKey(0), num_simulations=8,
        max_considered_actions=4, gumbel_scale=0.0, max_depth=4)
    greedy = np.asarray(gumbel.play_probs(res, 0.0))
    assert np.array_equal(greedy.argmax(-1), np.asarray(res.chosen_action))
    assert np.allclose(greedy.max(-1), 1.0)
    soft = np.asarray(gumbel.play_probs(res, 1.0))
    assert np.allclose(soft.sum(-1), 1.0, atol=1e-5)
    assert np.allclose(
        soft, np.asarray(mcts_search.probs_with_temperature(
            res.action_probs, jnp.float32(1.0))))
