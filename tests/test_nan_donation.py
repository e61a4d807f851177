"""NaN-guard and donation-correctness tests (SURVEY.md §5 suggestion,
VERDICT round-1 item 10).

The reference has no analog of either hazard: torch mutates modules in
place, while this framework's jitted ``train_step`` *donates* its state
(learner.py) — so a caller aliasing the donated buffers is the one
memory-corruption-shaped bug class SPMD doesn't rule out.  Round 1
prevented it only with a comment (``create_train_state`` copies); these
tests pin the behavior:

* donated step == undonated step, bit-exact;
* the caller's ``variables`` dict survives (and still serves inference)
  after arbitrarily many donated steps;
* the whole hot path (train step + MCTS search) runs clean under
  ``jax_debug_nans``, including adversarial batches (one-hot policies,
  extreme values, saturated planes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu import learner as learner_lib
from alphazero_reversi_tpu.config import ModelConfig, TrainingConfig
from alphazero_reversi_tpu.env import bitboard as env
from alphazero_reversi_tpu.mcts import search as search_lib
from alphazero_reversi_tpu.models import resnet

BATCH = 16


def _setup(policy_loss: str = "soft"):
    mcfg = ModelConfig(num_res_blocks=1, num_filters=16,
                       value_head_hidden_size=16)
    tcfg = TrainingConfig(policy_loss=policy_loss)
    net = resnet.build_network(mcfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    return net, variables, tcfg


def _batch(key, batch=BATCH, extreme: bool = False):
    k1, k2, k3 = jax.random.split(key, 3)
    if extreme:
        planes = jnp.ones((batch, 8, 8, 3), jnp.float32)
        policy = jax.nn.one_hot(
            jax.random.randint(k2, (batch,), 0, 65), 65)  # one-hot targets
        value = jnp.where(jnp.arange(batch) % 2 == 0, 1.0, -1.0)
    else:
        planes = jax.random.bernoulli(k1, 0.3, (batch, 8, 8, 3)).astype(
            jnp.float32)
        logits = jax.random.normal(k2, (batch, 65))
        policy = jax.nn.softmax(logits, axis=-1)
        value = jnp.tanh(jax.random.normal(k3, (batch,)))
    return planes, policy, value.astype(jnp.float32)


def test_donated_step_matches_undonated():
    """The donated jitted step computes exactly what an undonated one does."""
    net, variables, tcfg = _setup()
    tx = learner_lib.make_optimizer(tcfg)
    state_a = learner_lib.create_train_state(net, variables, tcfg)
    state_b = learner_lib.create_train_state(net, variables, tcfg)
    planes, policy, value = _batch(jax.random.PRNGKey(1))

    undonated = jax.jit(
        learner_lib.train_step.__wrapped__,
        static_argnames=("net", "tx", "policy_loss", "policy_weight",
                         "value_weight"))

    for i in range(3):
        state_a, aux_a = learner_lib.train_step(
            net, tx, state_a, planes, policy, value,
            policy_loss=tcfg.policy_loss)
        state_b, aux_b = undonated(
            net, tx, state_b, planes, policy, value,
            policy_loss=tcfg.policy_loss)
        assert float(aux_a["loss"]) == float(aux_b["loss"]), f"step {i}"

    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_callers_variables_survive_donation():
    """``create_train_state`` must copy: the init-time ``variables`` dict the
    caller holds (and hands to self-play/arena for inference) stays intact
    and usable after donated training steps (learner.py copy contract)."""
    net, variables, tcfg = _setup()
    saved = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), variables)

    lrn = learner_lib.Learner(net, variables, tcfg)
    planes, policy, value = _batch(jax.random.PRNGKey(2))
    for _ in range(3):
        lrn.step(planes, policy, value)

    # bit-identical leaves...
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(saved)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # ...and still valid device buffers for inference
    logits, val = resnet.apply_eval(net, variables, planes)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(val)).all()
    # training did change the learner's own params
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(lrn.state.params),
                        jax.tree_util.tree_leaves(saved["params"])))
    assert changed


@pytest.mark.parametrize("policy_loss", ["soft", "argmax"])
@pytest.mark.parametrize("extreme", [False, True])
def test_train_step_clean_under_debug_nans(policy_loss, extreme):
    """The full train step produces no NaNs, even on adversarial batches
    (one-hot targets make log-softmax terms large; saturated planes stress
    BN statistics)."""
    net, variables, tcfg = _setup(policy_loss)
    lrn = learner_lib.Learner(net, variables, tcfg)
    jax.config.update("jax_debug_nans", True)
    try:
        for i in range(3):
            planes, policy, value = _batch(
                jax.random.PRNGKey(10 + i), extreme=extreme)
            aux = lrn.step(planes, policy, value)
            assert np.isfinite(float(aux["loss"]))
            assert np.isfinite(float(aux["grad_norm"]))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_search_clean_under_debug_nans():
    """One full MCTS search (the other half of the hot path) under the NaN
    checker: terminal values, Dirichlet noise, and masked softmaxes must
    never produce NaN."""
    net, variables, _ = _setup()
    roots = env.initial_state((8,))
    jax.config.update("jax_debug_nans", True)
    try:
        out = search_lib.run_search(
            net, variables, roots, jax.random.PRNGKey(3),
            num_simulations=16, c_puct=1.0, dirichlet_alpha=0.3,
            dirichlet_epsilon=0.25)
        probs = np.asarray(out.action_probs)
        assert np.isfinite(probs).all()
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    finally:
        jax.config.update("jax_debug_nans", False)
