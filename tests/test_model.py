"""Tests for the Flax ResNet policy/value network."""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_reversi_tpu.config import ModelConfig
from alphazero_reversi_tpu.models import resnet


def small_cfg(**kw):
    base = dict(num_res_blocks=2, num_filters=16, compute_dtype="float32")
    base.update(kw)
    return ModelConfig(**base)


def test_forward_shapes_and_ranges():
    net = resnet.build_network(small_cfg())
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3))
    logits, value = resnet.apply_eval(net, variables, x)
    assert logits.shape == (4, 65)
    assert value.shape == (4,)
    assert logits.dtype == jnp.float32
    v = np.asarray(value)
    assert (v >= -1.0).all() and (v <= 1.0).all()


def test_train_step_updates_batch_stats():
    net = resnet.build_network(small_cfg())
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3))
    (_, _), mutated = resnet.apply_train(net, variables, x)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_bf16_compute_path():
    net = resnet.build_network(small_cfg(compute_dtype="bfloat16"))
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    # params stay f32
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    logits, value = resnet.apply_eval(net, variables, x)
    assert logits.dtype == jnp.float32  # heads emit f32
    assert np.isfinite(np.asarray(logits)).all()


def test_config_fields_honored():
    # value_head_hidden_size and dropout are wired (unlike the reference,
    # SURVEY.md §2.4).
    net = resnet.build_network(small_cfg(value_head_hidden_size=32, dropout=0.5))
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    assert variables["params"]["value_fc1"]["kernel"].shape == (64, 32)
    x = jnp.ones((4, 8, 8, 3))
    # dropout active in train mode -> stochastic outputs under different rngs
    (l1, _), _ = resnet.apply_train(net, variables, x,
                                    dropout_rng=jax.random.PRNGKey(1))
    (l2, _), _ = resnet.apply_train(net, variables, x,
                                    dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_masked_policy():
    logits = jnp.array([[0.0, 1.0, 2.0, 3.0]])
    mask = jnp.array([[True, False, True, False]])
    probs = np.asarray(resnet.masked_policy(logits, mask))
    assert probs[0, 1] == 0.0 and probs[0, 3] == 0.0
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-6)
    # all-illegal row falls back to uniform
    probs2 = np.asarray(resnet.masked_policy(logits, jnp.zeros_like(mask)))
    np.testing.assert_allclose(probs2, 0.25, rtol=1e-6)


def test_jit_and_vmap_compatible():
    net = resnet.build_network(small_cfg())
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, x: resnet.apply_eval(net, v, x))
    x = jnp.ones((2, 8, 8, 3))
    l1, v1 = fwd(variables, x)
    l2, v2 = fwd(variables, x)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_bn_free_variant():
    """ModelConfig.use_batch_norm=False: no batch statistics anywhere (the
    exact-DP variant, models/resnet.py) — forward shapes unchanged, training
    apply returns an empty batch_stats collection, and a Learner step runs."""
    from alphazero_reversi_tpu.config import TrainingConfig
    from alphazero_reversi_tpu.learner import Learner

    cfg = small_cfg()
    cfg.use_batch_norm = False
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    assert variables["batch_stats"] == {}
    assert not any("bn" in k for k in variables["params"])

    x = jnp.ones((2, 8, 8, 3))
    logits, value = resnet.apply_eval(net, variables, x)
    assert logits.shape == (2, 65) and value.shape == (2,)
    (logits_t, _), mutated = resnet.apply_train(net, variables, x)
    assert logits_t.shape == (2, 65)
    assert dict(mutated).get("batch_stats", {}) in ({}, None) or \
        not dict(mutated)["batch_stats"]

    lrn = Learner(net, variables, TrainingConfig(batch_size=2))
    policy = jnp.full((2, 65), 1.0 / 65)
    aux = lrn.step(jnp.ones((2, 8, 8, 3)), policy, jnp.zeros((2,)))
    assert np.isfinite(float(aux["loss"]))
