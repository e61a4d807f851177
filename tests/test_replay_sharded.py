"""Data-axis-sharded replay buffer (VERDICT r4 item 5) on the 8-device
virtual CPU mesh."""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_reversi_tpu import replay as replay_lib
from alphazero_reversi_tpu.config import ModelConfig, TrainingConfig
from alphazero_reversi_tpu.models import resnet
from alphazero_reversi_tpu.parallel import dp as dp_lib
from alphazero_reversi_tpu.parallel import mesh as mesh_lib
from alphazero_reversi_tpu.parallel import replay_sharded as rs


def _traj(key, t=5, b=16, all_valid=False):
    """Random [T, B] trajectory arrays with unique value labels per cell
    (so inserted rows can be identified by value)."""
    k1, k2, k3 = jax.random.split(key, 3)
    planes = jax.random.bernoulli(k1, 0.3, (t, b, 8, 8, 3)).astype(
        jnp.float32)
    policy = jax.nn.softmax(jax.random.normal(k2, (t, b, 65)), axis=-1)
    value = jnp.arange(t * b, dtype=jnp.float32).reshape(t, b) + 1.0
    valid = (jnp.ones((t, b), jnp.bool_) if all_valid
             else jax.random.bernoulli(k3, 0.7, (t, b)))
    return planes, policy, value, valid


def test_add_union_matches_replicated_insert():
    """The sharded insert must store exactly the valid positions the
    replicated ring insert stores (as a multiset — the ring ORDER is
    per-shard rather than global)."""
    m = mesh_lib.make_mesh()
    planes, policy, value, valid = _traj(jax.random.PRNGKey(0))
    buf = rs.add(m, rs.create(m, 128), planes, policy, value, valid)

    flat = lambda x: x.reshape(-1, *x.shape[2:])
    ref = replay_lib.add(replay_lib.create(128), flat(planes), flat(policy),
                         flat(value), flat(valid))
    assert rs.total_size(buf) == int(ref.size)
    # collect each shard's valid rows
    got = []
    host = jax.device_get(buf)
    d = host.cursor.shape[0]
    cl = host.value.shape[0] // d
    for i in range(d):
        got.extend(host.value[i * cl:i * cl + int(host.size[i])])
    want = np.asarray(ref.value)[:int(ref.size)]
    np.testing.assert_array_equal(np.sort(np.asarray(got)), np.sort(want))


def test_add_hlo_has_no_collectives():
    """Compile-level invariant: the shard-local insert emits zero
    cross-shard communication (the whole point vs the replicated buffer's
    per-iteration trajectory gather)."""
    m = mesh_lib.make_mesh()
    planes, policy, value, valid = _traj(jax.random.PRNGKey(1))
    buf = rs.create(m, 128)
    tb = lambda x: jax.device_put(
        x, jax.sharding.NamedSharding(
            m, jax.sharding.PartitionSpec(None, mesh_lib.DATA_AXIS)))
    hlo = rs.add.lower(m, buf, tb(planes), tb(policy), tb(value),
                       tb(valid)).compile().as_text()
    found = sorted(set(re.findall(
        r"all-reduce|all-gather|collective-permute|all-to-all"
        r"|reduce-scatter|collective-broadcast", hlo)))
    assert not found, f"sharded insert compiled with collectives: {found}"


def test_per_device_hbm_is_one_over_p():
    """Every leaf shards its leading axis: each device holds exactly 1/8 of
    the buffer bytes (VERDICT r4 weak 4's P× HBM cost removed)."""
    m = mesh_lib.make_mesh()
    buf = rs.create(m, 128)
    for leaf in (buf.planes, buf.policy, buf.value):
        assert len(leaf.sharding.device_set) == 8
        shard = leaf.addressable_shards[0]
        assert shard.data.shape[0] == leaf.shape[0] // 8
    assert buf.cursor.shape == (8,) and buf.size.shape == (8,)


def test_scanned_dp_bit_identical_when_shards_identical():
    """The sharded sampler draws the SAME global index vector against the
    local pool — so when every shard holds identical content (games tiled
    across shards), scanned DP SGD on the sharded buffer is bit-identical
    to the replicated-buffer path (the equivalence anchor; VERDICT r4
    item 5 'scanned-DP equivalence test vs the replicated buffer')."""
    m = mesh_lib.make_mesh()
    d = m.shape[mesh_lib.DATA_AXIS]
    t, g, cl = 4, 3, 32
    planes, policy, value, valid = _traj(jax.random.PRNGKey(2), t=t, b=g,
                                         all_valid=True)
    tile = lambda x: jnp.tile(x, (1, d) + (1,) * (x.ndim - 2))
    sharded_buf = rs.add(m, rs.create(m, d * cl), tile(planes),
                         tile(policy), tile(value), tile(valid))

    flat = lambda x: x.reshape(-1, *x.shape[2:])
    repl_buf = replay_lib.add(replay_lib.create(cl), flat(planes),
                              flat(policy), flat(value), flat(valid))

    model_cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                            value_head_hidden_size=16,
                            compute_dtype="float32")
    net = resnet.build_network(model_cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    cfg = TrainingConfig(learning_rate=1e-2)
    key = jax.random.PRNGKey(9)

    tr_sharded = dp_lib.DPTrainer(net, variables, cfg, m)
    aux_s = tr_sharded.steps(sharded_buf, key, 3, 16)
    tr_repl = dp_lib.DPTrainer(net, variables, cfg, m)
    aux_r = tr_repl.steps(repl_buf, key, 3, 16)

    assert float(aux_s["loss"]) == float(aux_r["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(tr_sharded.state),
                    jax.tree_util.tree_leaves(tr_repl.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_canonicalize_shard_roundtrip():
    """sharded -> canonical host -> re-sharded must preserve the stored
    positions exactly (the checkpoint boundary both ways)."""
    m = mesh_lib.make_mesh()
    planes, policy, value, valid = _traj(jax.random.PRNGKey(3))
    buf = rs.add(m, rs.create(m, 128), planes, policy, value, valid)
    canonical = rs.canonicalize_host(jax.device_get(buf))
    assert canonical.cursor.ndim == 0
    n = int(canonical.size)
    assert n == rs.total_size(buf)
    # canonical rows are compacted to the front
    assert np.all(canonical.value[:n] != 0)
    assert np.all(canonical.value[n:] == 0)

    back = rs.shard_host(m, canonical)
    assert rs.total_size(back) == n
    round2 = rs.canonicalize_host(jax.device_get(back))
    np.testing.assert_array_equal(np.sort(canonical.value[:n]),
                                  np.sort(round2.value[:n]))
    # second canonicalization of a canonical buffer is a no-op
    again = rs.canonicalize_host(canonical)
    np.testing.assert_array_equal(again.value, canonical.value)


def test_shard_host_handles_wrapped_unsharded_ring():
    """An old unsharded checkpoint whose ring has wrapped (cursor != size
    position) re-shards with all rows preserved, oldest-first."""
    m = mesh_lib.make_mesh()
    buf = replay_lib.create(16)
    mk = lambda n, off: (
        jnp.zeros((n, 8, 8, 3), jnp.float32),
        jnp.ones((n, 65), jnp.float32) / 65,
        jnp.arange(off, off + n, dtype=jnp.float32) + 1,
        jnp.ones((n,), jnp.bool_))
    buf = replay_lib.add(buf, *mk(12, 0))
    buf = replay_lib.add(buf, *mk(8, 12))  # wraps: capacity 16, 20 rows
    assert int(buf.size) == 16 and int(buf.cursor) == 4
    sharded = rs.shard_host(m, jax.device_get(buf))
    assert rs.total_size(sharded) == 16
    got = rs.canonicalize_host(jax.device_get(sharded))
    np.testing.assert_array_equal(
        np.sort(got.value[:16]), np.sort(np.asarray(buf.value)))


def test_pipeline_sharded_replay_end_to_end(tmp_path):
    """Full pipeline with shard_replay_buffer=True on the 8-device mesh:
    trains, checkpoints the canonical layout, and a fresh pipeline resumes
    with the same buffer contents re-sharded."""
    from alphazero_reversi_tpu.config import Config
    from alphazero_reversi_tpu.pipeline import AlphaZeroPipeline

    cfg = Config()
    cfg.seed = 4
    cfg.model.num_res_blocks = 1
    cfg.model.num_filters = 8
    cfg.model.value_head_hidden_size = 16
    cfg.model.compute_dtype = "float32"
    cfg.mcts.num_simulations = 2
    cfg.mcts.max_depth = 4
    cfg.self_play.num_games = 8
    cfg.self_play.num_parallel_games = 8
    cfg.self_play.max_moves = 4
    cfg.self_play.save_dir = str(tmp_path / "sp")
    cfg.training.batch_size = 8
    cfg.training.num_epochs = 1
    cfg.training.replay_capacity = 250  # rounds up to 256 on the 8-mesh
    cfg.training.shard_replay_buffer = True
    cfg.training.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.tournament.rounds = 0
    cfg.logging.log_dir = str(tmp_path / "logs")
    cfg.logging.use_tensorboard = False
    cfg.logging.verbose = False

    pipe = AlphaZeroPipeline(cfg, run_name="sharded")
    assert pipe.shard_replay
    assert cfg.training.replay_capacity == 256  # rounded + logged
    pipe.train()
    m = pipe.metrics_history[0]
    assert np.isfinite(m["train/loss"])
    assert m["selfplay/positions"] == 8 * 4
    assert m["replay/size"] == 8 * 4
    assert rs.is_sharded(pipe.buffer)
    saved_values = np.sort(rs.canonicalize_host(
        jax.device_get(pipe.buffer)).value)

    fresh = AlphaZeroPipeline(cfg, run_name="sharded2")
    assert fresh.load_checkpoint()
    assert fresh.iteration == 1
    assert rs.is_sharded(fresh.buffer)
    assert rs.total_size(fresh.buffer) == 8 * 4
    got = np.sort(rs.canonicalize_host(jax.device_get(fresh.buffer)).value)
    np.testing.assert_array_equal(got, saved_values)
    fresh.train(num_iterations=2)
    assert fresh.iteration == 2
    assert np.isfinite(fresh.metrics_history[-1]["train/loss"])
