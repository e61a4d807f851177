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


def test_reference_temperature_fields_migrate():
    """The reference's mcts.temperature / *.temperature_threshold spellings
    must land in the self-play schedule, not be silently dropped
    (SURVEY.md §2.4; VERDICT item 7)."""
    d = {"mcts": {"temperature": 0.7, "temperature_threshold": 21}}
    cfg = Config.from_dict(d)
    assert cfg.self_play.temp_init == 0.7
    assert cfg.self_play.temp_threshold == 21

    # the reference's default_config.json spells it inside self_play
    d = {"self_play": {"temperature_threshold": 10}}
    assert Config.from_dict(d).self_play.temp_threshold == 10

    # explicit new-style fields win over legacy spellings
    d = {"mcts": {"temperature": 0.7, "temperature_threshold": 21},
         "self_play": {"temp_init": 0.5, "temp_threshold": 3}}
    cfg = Config.from_dict(d)
    assert cfg.self_play.temp_init == 0.5
    assert cfg.self_play.temp_threshold == 3


def test_reference_default_config_loads():
    """The actual reference config file must load with its schedule intact."""
    cfg = Config.load("/root/reference/configs/default_config.json")
    assert cfg.mcts.num_simulations == 400
    assert cfg.self_play.num_games == 100
    assert cfg.self_play.temp_threshold == 10  # from temperature_threshold
    assert cfg.self_play.temp_init == 1.0  # from mcts.temperature


def test_legacy_batch_size_zero_migrates():
    """Configs written before multi-leaf expansion used mcts.batch_size=0
    ("one leaf per round"); run_search now requires a positive leaf count,
    so loading must migrate 0 -> 1 instead of crashing the first search."""
    from alphazero_reversi_tpu.config import Config

    cfg = Config.from_dict({"mcts": {"batch_size": 0}})
    assert cfg.mcts.batch_size == 1
    cfg = Config.from_dict({"mcts": {"batch_size": 4}})
    assert cfg.mcts.batch_size == 4


def test_tournament_gumbel_defaults_from_mcts():
    """tournament.{max_considered_actions,c_visit,c_scale} default from the
    mcts section so evaluation searches like self-play unless explicitly
    overridden (round-2 review finding: the arena silently used hardcoded
    Gumbel hyperparameters)."""
    from alphazero_reversi_tpu.config import Config

    d = {"mcts": {"algorithm": "gumbel", "max_considered_actions": 4,
                  "c_visit": 25.0, "c_scale": 0.2},
         "tournament": {"algorithm": "gumbel"}}
    cfg = Config.from_dict(d)
    assert cfg.tournament.max_considered_actions == 4
    assert cfg.tournament.c_visit == 25.0
    assert cfg.tournament.c_scale == 0.2

    d["tournament"]["max_considered_actions"] = 8
    cfg = Config.from_dict(d)
    assert cfg.tournament.max_considered_actions == 8  # explicit wins
    assert cfg.tournament.c_visit == 25.0  # others still inherited
