"""CLI end-to-end tests: create-config -> train -> resume -> tournament."""
import json
import os

import pytest

from alphazero_reversi_tpu import cli
from alphazero_reversi_tpu.config import Config


def _write_tiny_config(tmp_path) -> str:
    cfg = Config()
    cfg.seed = 1
    cfg.model.num_res_blocks = 1
    cfg.model.num_filters = 8
    cfg.model.value_head_hidden_size = 16
    cfg.model.compute_dtype = "float32"
    cfg.mcts.num_simulations = 8
    cfg.mesh.data_axis = 1  # single-device path (DP covered elsewhere)
    cfg.self_play.num_games = 2
    cfg.self_play.num_parallel_games = 2
    cfg.self_play.save_dir = str(tmp_path / "sp")
    cfg.training.batch_size = 16
    cfg.training.num_epochs = 1
    cfg.training.replay_capacity = 1024
    cfg.training.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.tournament.rounds = 1
    cfg.tournament.num_simulations = 4
    cfg.tournament.games_per_pair = 2
    cfg.tournament.output_dir = str(tmp_path / "tourn")
    cfg.logging.log_dir = str(tmp_path / "logs")
    cfg.logging.use_tensorboard = False
    cfg.logging.verbose = False
    path = str(tmp_path / "config.json")
    cfg.save(path)
    return path


def test_create_config(tmp_path):
    out = str(tmp_path / "default.json")
    assert cli.main(["create-config", "--output", out]) == 0
    loaded = Config.load(out)
    assert loaded.model.num_res_blocks == 5
    assert loaded.training.lr_milestones  # derived milestones present


def test_train_resume_tournament(tmp_path):
    cfg_path = _write_tiny_config(tmp_path)
    assert cli.main(["train", "--config", cfg_path]) == 0
    ckpt_dir = str(tmp_path / "ckpt")
    assert any(n.startswith("it_") for n in os.listdir(ckpt_dir))

    # `continue` picks up the checkpoint and runs one more iteration
    assert cli.main(["continue", "--config", cfg_path,
                     "--iterations", "2"]) == 0
    assert "it_000002" in os.listdir(ckpt_dir)

    # tournament over the saved checkpoints + random baseline
    assert cli.main(["tournament", "--config", cfg_path,
                     "--model-dir", ckpt_dir, "--rounds", "1"]) == 0
    elo_path = os.path.join(str(tmp_path / "tourn"), "elo_ratings.json")
    assert os.path.exists(elo_path)
    with open(elo_path) as f:
        data = json.load(f)
    assert "random" in data["ratings"]
    assert any(k.startswith("it_") for k in data["ratings"])


def test_run_dir_rewrites_paths(tmp_path):
    cfg_path = _write_tiny_config(tmp_path)
    run_parent = str(tmp_path / "runs")
    assert cli.main(["train", "--config", cfg_path,
                     "--run-dir", run_parent]) == 0
    runs = os.listdir(run_parent)
    assert len(runs) == 1 and runs[0].startswith("run_")
    run_dir = os.path.join(run_parent, runs[0])
    assert os.path.isdir(os.path.join(run_dir, "checkpoints"))
    assert os.path.exists(os.path.join(run_dir, "config.json"))


def test_analyze_command(tmp_path, capsys):
    """`analyze` searches a position and prints ranked moves."""
    from alphazero_reversi_tpu import cli
    from alphazero_reversi_tpu.config import Config

    cfg = Config()
    cfg.model.num_res_blocks = 1
    cfg.model.num_filters = 8
    cfg.model.compute_dtype = "float32"
    cfg.mcts.num_simulations = 8
    cfg.mcts.max_depth = 4
    p = str(tmp_path / "cfg.json")
    cfg.save(p)

    rc = cli.main(["analyze", "d3", "--config", p, "--top", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "root value" in out and "visits" in out
    # board renders with both colors and no unknown glyphs
    assert "X" in out and "O" in out and "?" not in out

    rc = cli.main(["analyze", "a1", "--config", p])
    assert rc == 1  # illegal opening move


def test_analyze_move_parsing_and_sims_rounding(tmp_path, capsys):
    """Malformed/off-board analyze tokens fail cleanly (no traceback, no
    silent wrap of e.g. 'i1' onto a different square), and --sims not
    divisible by mcts.batch_size rounds up with a notice."""
    from alphazero_reversi_tpu import cli
    from alphazero_reversi_tpu.config import Config

    cfg = Config()
    cfg.model.num_res_blocks = 1
    cfg.model.num_filters = 8
    cfg.model.compute_dtype = "float32"
    cfg.mcts.num_simulations = 8
    cfg.mcts.max_depth = 4
    cfg.mcts.batch_size = 4
    p = str(tmp_path / "cfg.json")
    cfg.save(p)

    for bad in ("d", "i1", "d9", "3,x", "9,9", "dd"):
        rc = cli.main(["analyze", bad, "--config", p])
        err = capsys.readouterr().err
        assert rc == 1, bad
        assert "bad move" in err, (bad, err)

    rc = cli.main(["analyze", "d3", "--config", p, "--sims", "10"])
    captured = capsys.readouterr()
    assert rc == 0
    assert "rounding --sims 10 up to 12" in captured.err
    assert "[12 simulations]" in captured.out


def test_platform_flag_parses(tmp_path, capsys):
    """--platform forces jax_platforms before dispatch (CPU-only hosts)."""
    from alphazero_reversi_tpu import cli
    from alphazero_reversi_tpu.config import Config

    cfg = Config()
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    rc = cli.main(["--platform", "cpu", "analyze", "zz", "--config", p])
    assert rc == 1  # parse error path — reached past the platform switch
    assert "bad move" in capsys.readouterr().err


def test_play_command(tmp_path, capsys, monkeypatch):
    """Interactive play: scripted stdin plays a couple of human moves (one
    bad, one illegal, then legal ones) against the 2-sim agent and quits;
    the loop recovers from bad input and the agent's replies are legal."""
    from alphazero_reversi_tpu import cli
    from alphazero_reversi_tpu.config import Config

    cfg = Config()
    cfg.model.num_res_blocks = 1
    cfg.model.num_filters = 8
    cfg.model.compute_dtype = "float32"
    cfg.mcts.num_simulations = 2
    cfg.mcts.max_depth = 4
    p = str(tmp_path / "cfg.json")
    cfg.save(p)

    moves = iter(["zz", "a1", "d3", "2,4", "q"])
    monkeypatch.setattr("builtins.input", lambda *a: next(moves))
    rc = cli.main(["play", "--config", p, "--color", "black"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "bad move 'zz'" in out
    assert "illegal move 'a1'" in out
    assert "agent plays" in out
    assert "game aborted" in out


def test_play_command_full_game_with_solver(tmp_path, capsys, monkeypatch):
    """A full game to completion: the 'human' always plays the first legal
    move (or passes); the agent uses 2 sims + exact endgames from 12
    empties. Must terminate with a final score line."""
    from alphazero_reversi_tpu import cli
    from alphazero_reversi_tpu.config import Config

    cfg = Config()
    cfg.model.num_res_blocks = 1
    cfg.model.num_filters = 8
    cfg.model.compute_dtype = "float32"
    cfg.mcts.num_simulations = 2
    cfg.mcts.max_depth = 4
    p = str(tmp_path / "cfg.json")
    cfg.save(p)

    # brute-force probing: offer every square each turn; the CLI loops on
    # illegal input, consuming the iterator until a legal one lands
    def gen():
        while True:
            for sq in range(64):
                yield f"{sq // 8},{sq % 8}"
            yield "pass"

    it = gen()
    monkeypatch.setattr("builtins.input", lambda *a: next(it))
    rc = cli.main(["play", "--config", p, "--color", "white",
                   "--solve", "12"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "game over:" in out
    assert "exact:" in out  # the solver kicked in at the endgame
