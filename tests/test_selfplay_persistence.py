"""Self-play trajectory persistence round-trip."""
import jax
import numpy as np

from alphazero_reversi_tpu import selfplay
from alphazero_reversi_tpu.config import MCTSConfig, ModelConfig, \
    SelfPlayConfig
from alphazero_reversi_tpu.models import resnet


def test_save_and_load_roundtrip(tmp_path):
    net = resnet.build_network(
        ModelConfig(num_res_blocks=1, num_filters=8,
                    compute_dtype="float32"))
    variables = resnet.init_variables(net, jax.random.PRNGKey(0))
    sp = selfplay.SelfPlay(net, variables, MCTSConfig(num_simulations=4),
                           SelfPlayConfig(num_parallel_games=2))
    traj = sp.generate_games(jax.random.PRNGKey(1))
    path = selfplay.save_trajectory(traj, str(tmp_path / "sp"), "it0")
    loaded = selfplay.load_trajectory_arrays(path)
    np.testing.assert_array_equal(loaded["planes"],
                                  np.asarray(traj.planes))
    np.testing.assert_allclose(loaded["policy"], np.asarray(traj.policy),
                               rtol=1e-6)
    np.testing.assert_array_equal(loaded["value"], np.asarray(traj.value))
    np.testing.assert_array_equal(loaded["valid"], np.asarray(traj.valid))
    np.testing.assert_array_equal(loaded["actions"],
                                  np.asarray(traj.actions))
    assert loaded["planes"].dtype == np.float32
