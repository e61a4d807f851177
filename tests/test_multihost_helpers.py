"""parallel.multihost helpers on the single-process 8-device virtual mesh.

The 2-process product test (test_multiprocess.py) proves the cross-process
behavior; these cover the helper mechanics — block assembly/reassembly and
replicated fetches — where every shard is addressable, plus the
single-process no-op paths.
"""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_reversi_tpu.config import MeshConfig
from alphazero_reversi_tpu.parallel import mesh as mesh_lib
from alphazero_reversi_tpu.parallel import multihost as mh


def _mesh():
    return mesh_lib.make_mesh(MeshConfig(data_axis=-1, model_axis=1))


def test_local_block_roundtrip_axis1():
    mesh = _mesh()
    d = mesh.shape[mesh_lib.DATA_AXIS]
    x = jnp.arange(5 * 2 * d * 3, dtype=jnp.float32).reshape(5, 2 * d, 3)
    sharded = mh.canonical_tb_sharding(mesh, x)
    block = mh.local_block(sharded, 1)
    # single process: the local block is the whole array
    np.testing.assert_array_equal(block, np.asarray(x))
    back = mh.from_local_block(mesh, np.ascontiguousarray(block * 2), 1)
    assert back.shape == x.shape
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x) * 2)


def test_local_block_with_model_axis_replicas():
    """A model_axis > 1 mesh replicates each data-axis slice once per
    model-axis device, so addressable_shards carry duplicate indices —
    local_block must dedup them BEFORE its contiguity check (a regression
    here raised 'shards not contiguous' on any model-parallel mesh)."""
    import pytest

    n = len(jax.devices())
    if n % 2:
        return  # needs an even device count for a data x model=2 mesh
    with pytest.warns(UserWarning, match="model_axis"):
        mesh = mesh_lib.make_mesh(MeshConfig(data_axis=n // 2, model_axis=2))
    d = mesh.shape[mesh_lib.DATA_AXIS]
    x = jnp.arange(3 * 2 * d * 2, dtype=jnp.float32).reshape(3, 2 * d, 2)
    sharded = mh.canonical_tb_sharding(mesh, x)
    assert len(sharded.addressable_shards) == n  # replicas present
    block = mh.local_block(sharded, 1)
    np.testing.assert_array_equal(block, np.asarray(x))


def test_fetch_replicated_mixes_shardings():
    mesh = _mesh()
    d = mesh.shape[mesh_lib.DATA_AXIS]
    sharded = mesh_lib.shard_batch(mesh, jnp.arange(4 * d, dtype=jnp.int32))
    repl = mesh_lib.replicate(mesh, jnp.ones((3,)))
    out = mh.fetch_replicated(mesh, {"a": sharded, "b": repl, "c": 7})
    assert isinstance(out["a"], np.ndarray)
    np.testing.assert_array_equal(out["a"], np.arange(4 * d))
    np.testing.assert_array_equal(out["b"], np.ones((3,)))
    assert out["c"] == 7


def test_single_process_noops():
    assert not mh.is_multiprocess()
    assert mh.is_primary()
    assert mh.broadcast_from_primary(42) == 42
    mh.barrier("noop")  # must not raise
    stats = {"solved": 3, "seconds": 1.5}
    assert mh.aggregate_stats(stats) == stats


def test_relabel_sharded_single_process():
    """relabel_sharded over the virtual mesh must agree with the plain
    host relabeling on the same trajectory."""
    from alphazero_reversi_tpu import selfplay as selfplay_lib
    from alphazero_reversi_tpu.config import ModelConfig
    from alphazero_reversi_tpu.models import resnet
    from alphazero_reversi_tpu.parallel import dp as dp_lib

    mesh = _mesh()
    d = mesh.shape[mesh_lib.DATA_AXIS]
    cfg = ModelConfig(num_res_blocks=1, num_filters=8,
                      value_head_hidden_size=16, compute_dtype="float32")
    net = resnet.build_network(cfg)
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    traj = dp_lib.sharded_play_games(
        net, variables, jax.random.PRNGKey(2), mesh, num_games=d,
        num_simulations=2, c_puct=1.0, dirichlet_alpha=0.3,
        dirichlet_epsilon=0.25, temp_threshold=15, temp_init=1.0,
        temp_final=0.1, max_depth=4, max_moves=60)

    out_sharded, stats_sharded = mh.relabel_sharded(mesh, traj, 8, False,
                                                    None)
    out_host, stats_host = selfplay_lib.relabel_exact_values_with_stats(
        jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), traj),
        8, compat=False)
    np.testing.assert_allclose(np.asarray(out_sharded.value),
                               np.asarray(out_host.value))
    assert stats_sharded["solved"] == stats_host["solved"]
    assert stats_sharded["changed"] == stats_host["changed"]
