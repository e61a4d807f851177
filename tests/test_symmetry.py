"""Dihedral-8 symmetry module: group structure, rule equivariance (the
property that justifies augmentation — correct mode only, SURVEY.md §2.5
quirks break it in compat mode), and the train-step wiring."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_reversi_tpu import symmetry
from alphazero_reversi_tpu.env.oracle import MODE_CORRECT, OracleBoard


def test_perms_are_permutations():
    for s in range(symmetry.NUM_SYMS):
        assert np.array_equal(np.sort(symmetry.PERMS[s]), np.arange(64))
    # all 8 distinct, identity first
    assert len({tuple(p) for p in symmetry.PERMS}) == 8
    assert np.array_equal(symmetry.PERMS[0], np.arange(64))


def test_inverse_composition():
    for s in range(symmetry.NUM_SYMS):
        inv = symmetry.INVERSE[s]
        assert np.array_equal(symmetry.PERMS[inv][symmetry.PERMS[s]],
                              np.arange(64))


def _bb_to_mask(bb: int) -> np.ndarray:
    return np.array([(bb >> i) & 1 for i in range(64)], dtype=bool)


def _mask_to_bb(mask: np.ndarray) -> int:
    return int(sum(1 << i for i in range(64) if mask[i]))


def _random_midgame(rng: np.random.Generator, plies: int) -> OracleBoard:
    b = OracleBoard(MODE_CORRECT)
    for _ in range(plies):
        if b.game_over:
            break
        moves = b.get_valid_moves()
        if not moves:
            break
        r, c = moves[rng.integers(len(moves))]
        b.make_move(r, c)
    return b


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rules_equivariant_under_dihedral(seed):
    """legal(transform(board)) == transform(legal(board)) for every one of
    the 8 symmetries, on random midgame positions — correct Othello rules
    are D4-equivariant, validating augmentation semantics end to end."""
    rng = np.random.default_rng(seed)
    board = _random_midgame(rng, plies=int(rng.integers(5, 40)))
    legal = _bb_to_mask(board.legal_moves_bb())
    black = _bb_to_mask(board.black)
    white = _bb_to_mask(board.white)
    for s in range(symmetry.NUM_SYMS):
        perm = symmetry.PERMS[s]
        tb = OracleBoard(MODE_CORRECT)
        tb.set_position(_mask_to_bb(black[perm]), _mask_to_bb(white[perm]),
                        to_move=board.current_player)
        np.testing.assert_array_equal(
            _bb_to_mask(tb.legal_moves_bb()), legal[perm],
            err_msg=f"legal mask not equivariant under symmetry {s}")


def test_apply_planes_policy_consistent():
    """planes and policy transform by the SAME cell permutation; the pass
    column is invariant."""
    rng = np.random.default_rng(3)
    planes = jnp.asarray(rng.random((4, 8, 8, 3)), jnp.float32)
    policy = jnp.asarray(rng.random((4, 65)), jnp.float32)
    sym = jnp.asarray([0, 3, 5, 7], jnp.int32)
    tp = np.asarray(symmetry.apply_to_planes(planes, sym))
    tq = np.asarray(symmetry.apply_to_policy(policy, sym))
    for i, s in enumerate([0, 3, 5, 7]):
        perm = symmetry.PERMS[s]
        np.testing.assert_allclose(
            tp[i].reshape(64, 3), np.asarray(planes)[i].reshape(64, 3)[perm])
        np.testing.assert_allclose(tq[i, :64], np.asarray(policy)[i, :64][perm])
        assert tq[i, 64] == np.asarray(policy)[i, 64]
    # sym=0 is the identity
    np.testing.assert_array_equal(tp[0], np.asarray(planes)[0])


def test_train_step_with_augmentation():
    """The augmented jitted step runs, produces finite loss, and sees a
    different (transformed) batch than the unaugmented step."""
    from alphazero_reversi_tpu import learner as learner_lib
    from alphazero_reversi_tpu.config import ModelConfig, TrainingConfig
    from alphazero_reversi_tpu.models import resnet

    cfg = TrainingConfig(batch_size=8, augment_symmetries=True)
    net = resnet.build_network(ModelConfig(num_res_blocks=1, num_filters=8,
                                           value_head_hidden_size=16,
                                           compute_dtype="float32"))
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    planes = jnp.asarray(rng.random((8, 8, 8, 3)), jnp.float32)
    policy = jax.nn.softmax(jnp.asarray(rng.random((8, 65)), jnp.float32))
    value = jnp.asarray(rng.uniform(-1, 1, (8,)), jnp.float32)

    aug = learner_lib.Learner(net, variables, cfg)
    out = aug.step(planes, policy, value, dropout_rng=jax.random.PRNGKey(9))
    assert np.isfinite(float(out["loss"]))

    plain = learner_lib.Learner(
        net, variables,
        TrainingConfig(batch_size=8, augment_symmetries=False))
    out_plain = plain.step(planes, policy, value,
                           dropout_rng=jax.random.PRNGKey(9))
    # same weights, same rng, different effective batch -> different loss
    assert float(out["loss"]) != float(out_plain["loss"])


def test_augment_requires_rng():
    from alphazero_reversi_tpu import learner as learner_lib
    from alphazero_reversi_tpu.config import ModelConfig
    from alphazero_reversi_tpu.models import resnet

    net = resnet.build_network(ModelConfig(num_res_blocks=1, num_filters=8,
                                           value_head_hidden_size=16,
                                           compute_dtype="float32"))
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="augment"):
        learner_lib.loss_fn(
            net, variables["params"], variables["batch_stats"],
            jnp.zeros((2, 8, 8, 3)), jnp.zeros((2, 65)), jnp.zeros((2,)),
            policy_loss="soft", policy_weight=1.0, value_weight=1.0,
            dropout_rng=None, augment_symmetries=True)
