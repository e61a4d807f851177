"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest) —
the TPU-world answer to multi-node testing without a cluster (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu import learner as learner_lib
from alphazero_reversi_tpu import selfplay as selfplay_lib
from alphazero_reversi_tpu.config import MeshConfig, ModelConfig, \
    TrainingConfig
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.parallel import dp, mesh as mesh_lib


@pytest.fixture(scope="module")
def net_and_vars():
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      value_head_hidden_size=16, compute_dtype="float32")
    net = resnet.build_network(cfg)
    return net, resnet.init_variables(net, jax.random.PRNGKey(0))


def test_mesh_shapes():
    m = mesh_lib.make_mesh(MeshConfig())
    assert m.shape == {"data": 8, "model": 1}
    m2 = mesh_lib.make_mesh(MeshConfig(data_axis=4, model_axis=2))
    assert m2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(MeshConfig(data_axis=3, model_axis=1),
                           devices=jax.devices())


def test_shard_batch_places_on_all_devices():
    m = mesh_lib.make_mesh()
    x = jnp.arange(16.0).reshape(16, 1)
    sx = mesh_lib.shard_batch(m, x)
    assert len(sx.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sx), np.asarray(x))


def test_dp_train_step_matches_single_device(net_and_vars):
    """Collective wiring check: every shard fed the SAME local batch must
    reproduce the single-device step on that batch exactly (pmean of equal
    grads/BN-stats is the identity). Note per-shard BatchNorm means DP on
    *different* shards legitimately differs from one big batch — like every
    DP framework without full SyncBN normalization."""
    net, variables = net_and_vars
    cfg = TrainingConfig(learning_rate=1e-2, gradient_clip=1e9)
    m = mesh_lib.make_mesh()

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    planes = jax.random.bernoulli(k1, 0.3, (4, 8, 8, 3)).astype(jnp.float32)
    policy = jax.nn.softmax(jax.random.normal(k2, (4, 65)), axis=-1)
    value = jnp.tanh(jax.random.normal(k3, (4,)))

    single = learner_lib.Learner(net, variables, cfg)
    aux_single = single.step(planes, policy, value)

    trainer = dp.DPTrainer(net, variables, cfg, m)
    aux_dp = trainer.step(jnp.tile(planes, (8, 1, 1, 1)),
                          jnp.tile(policy, (8, 1)), jnp.tile(value, (8,)))
    np.testing.assert_allclose(float(aux_dp["loss"]),
                               float(aux_single["loss"]), rtol=1e-5)

    for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                    jax.tree_util.tree_leaves(trainer.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(single.state.batch_stats),
                    jax.tree_util.tree_leaves(trainer.state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_dp_step_on_distinct_shards_runs_and_replicates(net_and_vars):
    """With genuinely different per-shard data the step must still produce a
    replicated, finite state (grads pmean'd, params identical everywhere)."""
    net, variables = net_and_vars
    cfg = TrainingConfig(learning_rate=1e-3)
    m = mesh_lib.make_mesh()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    planes = jax.random.bernoulli(k1, 0.3, (32, 8, 8, 3)).astype(jnp.float32)
    policy = jax.nn.softmax(jax.random.normal(k2, (32, 65)), axis=-1)
    value = jnp.tanh(jax.random.normal(k3, (32,)))

    trainer = dp.DPTrainer(net, variables, cfg, m)
    aux = trainer.step(planes, policy, value)
    assert np.isfinite(float(aux["loss"]))
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_sharded_selfplay_matches_unsharded(net_and_vars):
    """Sharding is a placement decision, not a math change: identical keys
    must give identical games."""
    net, variables = net_and_vars
    m = mesh_lib.make_mesh()
    kwargs = dict(num_simulations=8, c_puct=1.0, dirichlet_alpha=0.3,
                  dirichlet_epsilon=0.25, temp_threshold=4, temp_init=1.0,
                  temp_final=0.1, max_moves=60)
    key = jax.random.PRNGKey(5)
    sharded = dp.sharded_play_games(net, variables, key, m, num_games=8,
                                    **kwargs)
    plain = selfplay_lib.play_games(net, variables, key, num_games=8,
                                    **kwargs)
    np.testing.assert_array_equal(np.asarray(sharded.actions),
                                  np.asarray(plain.actions))
    np.testing.assert_array_equal(np.asarray(sharded.value),
                                  np.asarray(plain.value))
    assert bool(sharded.final_state.done.all())


def test_sharded_selfplay_rejects_indivisible(net_and_vars):
    net, variables = net_and_vars
    m = mesh_lib.make_mesh()
    with pytest.raises(ValueError):
        dp.sharded_play_games(net, variables, jax.random.PRNGKey(0), m,
                              num_games=3, num_simulations=2, c_puct=1.0,
                              dirichlet_alpha=0.3, dirichlet_epsilon=0.25,
                              temp_threshold=4, temp_init=1.0,
                              temp_final=0.1)
