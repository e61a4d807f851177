"""Config round-trip tests (reference analog: test_config.py)."""
import os

from alphazero_reversi_tpu.config import Config, get_default_config


def test_default_config():
    cfg = get_default_config()
    assert cfg.model.num_res_blocks == 5
    assert cfg.model.num_filters == 128
    assert cfg.mcts.num_simulations == 500
    assert cfg.training.lr_milestones == [5, 7]


def test_round_trip(tmp_path):
    cfg = get_default_config()
    cfg.seed = 7
    cfg.mcts.num_simulations = 32
    cfg.env_compat = True
    path = os.path.join(tmp_path, "cfg.json")
    cfg.save(path)
    loaded = Config.load(path)
    assert loaded.to_dict() == cfg.to_dict()


def test_unknown_fields_ignored(tmp_path):
    cfg = get_default_config()
    d = cfg.to_dict()
    d["model"]["legacy_field"] = 123  # e.g. a reference config file
    loaded = Config.from_dict(d)
    assert loaded.model.num_filters == 128
