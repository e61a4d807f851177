"""MCTS correctness tests — the invariants the reference never tested
(SURVEY.md §4: visit-count conservation, legality of root children,
terminal-value handling, noise/temperature behavior)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu.config import MCTSConfig, ModelConfig
from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.mcts import search as mcts_search
from alphazero_reversi_tpu.mcts import tree as tree_lib
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.ops import u64

SIMS = 24
B = 4


@pytest.fixture(scope="module")
def net_and_vars():
    net = resnet.build_network(
        ModelConfig(num_res_blocks=1, num_filters=8, compute_dtype="float32"))
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    return net, variables


@pytest.fixture(scope="module")
def result(net_and_vars):
    net, variables = net_and_vars
    roots = env.initial_state((B,))
    return mcts_search.run_search(
        net, variables, roots, jax.random.PRNGKey(1),
        num_simulations=SIMS, c_puct=1.0, dirichlet_alpha=0.3,
        dirichlet_epsilon=0.25, max_depth=64)


def test_visit_conservation(result):
    # Every simulation increments the root visit exactly once.
    np.testing.assert_array_equal(np.asarray(result.tree.root_visit), SIMS)
    # Root children visits sum to total sims (every sim passes through one
    # root child unless the root itself were terminal).
    np.testing.assert_array_equal(
        np.asarray(result.visit_counts.sum(-1)), SIMS)


def test_only_legal_root_actions_visited(result):
    roots = env.initial_state((B,))
    legal = np.asarray(jax.vmap(env.legal_action_mask)(roots))
    counts = np.asarray(result.visit_counts)
    assert (counts[~legal] == 0).all()
    assert (counts.sum(-1) > 0).all()
    probs = np.asarray(result.action_probs)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_node_count_bounded(result):
    counts = np.asarray(tree_lib.num_linked_nodes(result.tree))
    assert (counts <= SIMS + 1).all()
    assert (counts > 1).all()


def test_child_states_consistent(result):
    """Each root child's stored env state equals stepping the root."""
    t = result.tree
    children = np.asarray(tree_lib.children_index(t))[:, 0]  # [B, A]
    states = tree_lib.node_states(t)
    for b in range(B):
        root_state = jax.tree_util.tree_map(lambda x: x[b, 0], states)
        for a in range(64):
            c = children[b, a]
            if c <= 0:
                continue
            stepped, valid = env.step(root_state, jnp.int32(a))
            assert bool(valid)
            assert int(u64.to_int(stepped.black)) == u64.to_int(
                jax.tree_util.tree_map(lambda x: x[b, c], states).black)


def test_greedy_temperature():
    counts = jnp.array([[0, 10, 5, 0]])
    probs = np.asarray(mcts_search.probs_with_temperature(counts, jnp.float32(0.0)))
    np.testing.assert_array_equal(probs, [[0, 1, 0, 0]])
    probs1 = np.asarray(mcts_search.probs_with_temperature(counts, jnp.float32(1.0)))
    np.testing.assert_allclose(probs1, [[0, 10 / 15, 5 / 15, 0]], rtol=1e-5)
    # low temperature sharpens
    probs_low = np.asarray(
        mcts_search.probs_with_temperature(counts, jnp.float32(0.25)))
    assert probs_low[0, 1] > probs1[0, 1]


def test_dirichlet_noise_stays_on_legal():
    prior = jnp.array([0.5, 0.5, 0.0, 0.0])
    legal = jnp.array([True, True, False, False])
    noisy = np.asarray(mcts_search.add_dirichlet_noise(
        prior, legal, jax.random.PRNGKey(0), 0.3, 0.25))
    assert noisy[2] == 0.0 and noisy[3] == 0.0
    np.testing.assert_allclose(noisy.sum(), 1.0, rtol=1e-6)
    # different keys -> different noise
    noisy2 = np.asarray(mcts_search.add_dirichlet_noise(
        prior, legal, jax.random.PRNGKey(1), 0.3, 0.25))
    assert not np.allclose(noisy, noisy2)


def test_terminal_root_search(net_and_vars):
    """Search on an already-finished game neither crashes nor allocates."""
    net, variables = net_and_vars
    done_state = env.initial_state((2,))._replace(
        done=jnp.ones(2, jnp.bool_), winner=jnp.array([1, 2], jnp.int32))
    res = mcts_search.run_search(
        net, variables, done_state, jax.random.PRNGKey(0),
        num_simulations=4, c_puct=1.0, dirichlet_alpha=0.3,
        dirichlet_epsilon=0.25, max_depth=64)
    assert (np.asarray(res.visit_counts) == 0).all()
    assert (np.asarray(tree_lib.num_linked_nodes(res.tree)) == 1).all()
    # terminal value backed up at root: winner==to_move(black) -> +1, else -1
    np.testing.assert_allclose(np.asarray(res.root_value), [1.0, -1.0])


def test_search_prefers_winning_move(net_and_vars):
    """MCTS with enough sims finds a mate-in-1 despite an untrained net.

    Position: black plays (0,0) to end the game with a winning score.
    """
    net, variables = net_and_vars
    black = 0
    white = 1 << 1
    for i in range(2, 64):
        black |= 1 << i
    state = env.initial_state((1,))._replace(
        black=u64.from_int(black, (1,)), white=u64.from_int(white, (1,)))
    res = mcts_search.run_search(
        net, variables, state, jax.random.PRNGKey(0),
        num_simulations=30, c_puct=1.5, dirichlet_alpha=0.3,
        dirichlet_epsilon=0.0, max_depth=64, add_noise=False)
    # (0,0) is the only legal move here, so it must get all visits;
    # root value should be the win.
    assert int(np.asarray(res.visit_counts)[0, 0]) == 30
    np.testing.assert_allclose(np.asarray(res.root_value), [1.0], atol=1e-6)


def test_sample_actions_respects_support():
    probs = jnp.array([[0.0, 1.0, 0.0, 0.0]] * 8)
    acts = np.asarray(mcts_search.sample_actions(jax.random.PRNGKey(0), probs))
    assert (acts == 1).all()


def test_backup_and_link_matches_numpy_reference():
    """The fused whole-path backup+link scatter (mcts/tree.py) must apply
    exactly: +1 visit and +value per path level, and one child link, with
    the packed visits|child f32 encoding decoding losslessly."""
    rng = np.random.default_rng(3)
    B, N, L = 4, 9, 6
    t0 = tree_lib.make_tree(B, N)
    nodes = np.asarray(rng.integers(-1, N, size=(B, L)), np.int32)
    actions = np.asarray(rng.integers(0, tree_lib.A, size=(B, L)), np.int32)
    vals = rng.normal(size=(B, L)).astype(np.float32)
    link_node = np.asarray(rng.integers(0, N, size=(B,)), np.int32)
    link_action = np.asarray(
        rng.integers(0, tree_lib.A, size=(B,)), np.int32)
    link_slot = np.full((B,), 7, np.int32)
    do_link = np.asarray([True, False, True, True])

    out = tree_lib.backup_and_link(
        t0, jnp.asarray(nodes), jnp.asarray(actions), jnp.asarray(vals),
        jnp.asarray(link_node), jnp.asarray(link_action),
        jnp.asarray(link_slot), jnp.asarray(do_link))

    # numpy reference
    visits = np.zeros((B, N, tree_lib.A), np.int64)
    vsum = np.zeros((B, N, tree_lib.A), np.float64)
    child = np.zeros((B, N, tree_lib.A), np.int64)
    for b in range(B):
        for d in range(L):
            n = nodes[b, d]
            if n < 0:
                continue
            visits[b, n, actions[b, d]] += 1
            vsum[b, n, actions[b, d]] += vals[b, d]
        if do_link[b]:
            child[b, link_node[b], link_action[b]] = link_slot[b]

    got_visits = np.asarray(tree_lib.visit_counts(out))
    got_child = np.asarray(tree_lib.children_index(out))
    stats3 = np.asarray(out.stats).reshape(B, N, tree_lib.STRIDE)
    got_vsum = stats3[:, :, tree_lib.VSUM_OFF:tree_lib.VSUM_OFF + tree_lib.A]
    np.testing.assert_array_equal(got_visits, visits)
    np.testing.assert_array_equal(got_child, child)
    np.testing.assert_allclose(got_vsum, vsum, rtol=1e-5, atol=1e-6)


def test_staged_capacity_matches_unstaged():
    """Staged tree-capacity growth (num_stages>1) must be bit-identical to
    the single-stage search: slot allocation is global and stage capacity
    always covers every slot a stage can write (search._stage_bounds)."""
    cfg = ModelConfig(num_res_blocks=1, num_filters=8)
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(3))
    roots = env.initial_state((4,))
    key = jax.random.PRNGKey(11)
    kw = dict(num_simulations=37, c_puct=1.0, dirichlet_alpha=0.3,
              dirichlet_epsilon=0.25)
    r1 = mcts_search.run_search(net, variables, roots, key,
                                num_stages=1, **kw)
    for stages in (3, 4):
        rs = mcts_search.run_search(net, variables, roots, key,
                                    num_stages=stages, **kw)
        np.testing.assert_array_equal(np.asarray(r1.visit_counts),
                                      np.asarray(rs.visit_counts))
        np.testing.assert_allclose(np.asarray(r1.root_value),
                                   np.asarray(rs.root_value), rtol=1e-6)


def test_stage_bounds_cover_all_simulations():
    for sims in (1, 2, 5, 8, 37, 100, 400):
        for stages in (1, 2, 4, 8):
            b = mcts_search._stage_bounds(sims, stages)
            assert b[-1] == sims
            assert all(x < y for x, y in zip(b, b[1:]))


def test_pallas_backup_interpret_matches_scatter():
    """The Pallas backup kernel (interpret mode, runs on CPU) must equal
    the jnp scatter-add path exactly."""
    from alphazero_reversi_tpu.mcts import pallas_backup

    rng = np.random.default_rng(5)
    B, N, L = 16, 33, 6
    S = tree_lib.STRIDE
    stats = jnp.asarray(rng.normal(size=(B, N * S)).astype(np.float32))
    nodes = jnp.asarray(
        np.where(rng.random((B, L)) < 0.7,
                 rng.integers(0, N, (B, L)), -1).astype(np.int32))
    actions = jnp.asarray(rng.integers(0, tree_lib.A, (B, L)).astype(np.int32))
    incs = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    link_node = jnp.asarray(rng.integers(0, N, (B,)).astype(np.int32))
    link_action = jnp.asarray(rng.integers(0, tree_lib.A, (B,)).astype(np.int32))
    link_slot = jnp.asarray(rng.integers(1, N, (B,)).astype(np.int32))
    do_link = jnp.asarray(rng.random((B,)) < 0.8)

    t = tree_lib.Tree(rows=jnp.zeros((B, N, tree_lib.K), jnp.float32),
                      stats=stats,
                      root_visit=jnp.zeros((B,), jnp.int32),
                      root_vsum=jnp.zeros((B,), jnp.float32))
    expected = tree_lib.backup_and_link(
        t, nodes, actions, incs, link_node, link_action, link_slot,
        do_link).stats

    link = jnp.stack([link_node, link_action,
                      jnp.where(do_link, link_slot, -1)], -1).astype(jnp.int32)
    got = pallas_backup.backup_and_link_tpu(
        stats, jnp.float32(tree_lib.PACK), nodes, actions, incs, link,
        games_per_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


# ---------------- multi-leaf expansion (MCTSConfig.batch_size) -------------

@pytest.fixture(scope="module")
def result_l4(net_and_vars):
    net, variables = net_and_vars
    roots = env.initial_state((B,))
    return mcts_search.run_search(
        net, variables, roots, jax.random.PRNGKey(1),
        num_simulations=SIMS, c_puct=1.0, dirichlet_alpha=0.3,
        dirichlet_epsilon=0.25, max_depth=64, leaf_batch=4)


def test_multileaf_visit_conservation(result_l4):
    """leaf_batch=4: every round backs up 4 leaves; totals must still equal
    the simulation budget."""
    np.testing.assert_array_equal(np.asarray(result_l4.tree.root_visit),
                                  SIMS)
    np.testing.assert_array_equal(
        np.asarray(result_l4.visit_counts.sum(-1)), SIMS)


def test_multileaf_only_legal_root_actions(result_l4):
    roots = env.initial_state((B,))
    legal = np.asarray(jax.vmap(env.legal_action_mask)(roots))
    counts = np.asarray(result_l4.visit_counts)
    assert (counts[~legal] == 0).all()
    # root virtual loss must have spread the round's descents: an opening
    # position has 4 legal moves, so with 6 rounds x 4 leaves every legal
    # root action gets explored
    assert (counts[legal].reshape(B, 4) > 0).all()


def test_multileaf_links_unique_and_consistent(result_l4):
    """No edge may be linked twice (packed child slots stay exact), and
    every linked child's state equals stepping its parent."""
    t = result_l4.tree
    children = np.asarray(tree_lib.children_index(t))  # [B, N, A]
    states = tree_lib.node_states(t)
    for b in range(B):
        linked = children[b][children[b] > 0]
        assert len(linked) == len(set(linked.tolist())), \
            "a slot was linked from two edges"
        assert (linked <= SIMS).all()
    # spot-check child state consistency at the root
    root_children = children[:, 0]
    for b in range(B):
        root_state = jax.tree_util.tree_map(lambda x: x[b, 0], states)
        for a in range(64):
            c = root_children[b, a]
            if c <= 0:
                continue
            stepped, valid = env.step(root_state, jnp.int32(a))
            assert bool(valid)
            assert int(u64.to_int(stepped.black)) == u64.to_int(
                jax.tree_util.tree_map(lambda x: x[b, c], states).black)


def test_multileaf_rejects_indivisible_sims(net_and_vars):
    net, variables = net_and_vars
    roots = env.initial_state((B,))
    with pytest.raises(ValueError):
        mcts_search.run_search(
            net, variables, roots, jax.random.PRNGKey(1),
            num_simulations=10, c_puct=1.0, dirichlet_alpha=0.3,
            dirichlet_epsilon=0.25, leaf_batch=4)


def test_multileaf_staged_matches_unstaged(net_and_vars):
    """Staged capacity growth must stay bit-identical under multi-leaf."""
    net, variables = net_and_vars
    roots = env.initial_state((B,))
    kwargs = dict(num_simulations=SIMS, c_puct=1.0, dirichlet_alpha=0.3,
                  dirichlet_epsilon=0.25, max_depth=64, leaf_batch=4)
    a = mcts_search.run_search(net, variables, roots, jax.random.PRNGKey(2),
                               num_stages=1, **kwargs)
    c = mcts_search.run_search(net, variables, roots, jax.random.PRNGKey(2),
                               num_stages=3, **kwargs)
    np.testing.assert_array_equal(np.asarray(a.visit_counts),
                                  np.asarray(c.visit_counts))
    np.testing.assert_allclose(np.asarray(a.root_value),
                               np.asarray(c.root_value), rtol=1e-6)
